package graft.pipeline

import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gradient-boosted-tree ranking head over the reference's 38-column
  * training matrix — the downstream model its README positions the
  * whole pipeline as feed for (`/root/reference/README.md:21` "18 base
  * features + 21 interaction/embedding features for
  * LightGBM/XGBoost/CatBoost"; `README.md:196,218`). The reference
  * ships no trainer code, so this is the capability a user finishing
  * its tutorial reaches for first: score each (session, anchor-ts)
  * instance's candidate categories and rank them, closing the
  * candidates → features → model → Recall@20 loop
  * (`README.md:217`).
  *
  * Distributed MLlib `GBTClassifier` (histogram tree boosting over
  * partitioned instances — no driver-side matrix), like ALS/Word2Vec
  * spec-verified by invariants (fixed-seed determinism, AUC floor,
  * importance sanity) rather than hash-oracled: ensemble splits vary
  * at solver precision across cluster layouts.
  */
object Ranker {

  /** The artifact's 18 base features (README.md:21), in schema order. */
  val baseFeatures: Seq[String] = Seq(
    "n_prefix_items", "n_prefix_events", "cat_count_in_prefix",
    "cat_share_in_prefix", "recency_sec", "log_recency", "hour_of_day",
    "day_of_week", "is_weekend", "time_since_session_start",
    "session_cat_diversity", "cat_popularity", "log_cat_pop",
    "user_cat_hist", "log_user_cat_hist", "user_cat_sessions",
    "user_total_sessions", "user_avg_session_dur")

  /** The 16 category-embedding slots appended by the pipeline's
    * Word2Vec stage (the artifact's cat_emb_0..15).
    */
  val embFeatures: Seq[String] = (0 until 16).map(i => s"cat_emb_$i")

  /** The three user-history features the reference computed over the
    * WHOLE train window (`prepare_training_data_pyspark.py:509-521`:
    * `user_cat_aff` aggregates all train_events, so each train row's
    * history includes its own label event) — target leakage that
    * Eval.labelSignalAucPpm screens at 0.92 train-AUC vs 0.50
    * valid-AUC, and that INVERTS the GBT head's generalization when
    * fed (valid AUC 0.34 with vs 0.975 without; RankerSpec measures
    * both sides).
    */
  val leakyFeatures: Set[String] =
    Set("user_cat_hist", "log_user_cat_hist", "user_cat_sessions")

  /** The trainable surface: base + embedding features minus the leaky
    * user-history family.
    */
  val screenedFeatures: Seq[String] =
    baseFeatures.filterNot(leakyFeatures) ++ embFeatures

  /** Assemble the feature vector. The artifact is dense (GoldenParity
    * pins zero nulls), so assembly is error-on-invalid: a null here
    * means the upstream join contract broke — fail loud, don't impute.
    */
  def assemble(df: DataFrame, features: Seq[String] = baseFeatures ++ embFeatures): DataFrame =
    new VectorAssembler()
      .setInputCols(features.toArray)
      .setOutputCol("features")
      .setHandleInvalid("error")
      .transform(df)

  /** Train the GBT head on an assembled frame with a 0/1 `y` label. */
  def train(
      assembled: DataFrame,
      maxIter: Int = 10,
      maxDepth: Int = 5,
      seed: Long = 42L): GBTClassificationModel =
    new GBTClassifier()
      .setLabelCol("y")
      .setFeaturesCol("features")
      .setMaxIter(maxIter)
      .setMaxDepth(maxDepth)
      .setSeed(seed)
      .fit(assembled.withColumn("y", col("y").cast("double")))

  /** Score an assembled frame: appends `p1` = P(y=1). */
  def score(model: GBTClassificationModel, assembled: DataFrame): DataFrame =
    model
      .transform(assembled)
      .withColumn("p1", vector_to_array(col("probability")).getItem(1))
      .drop("rawPrediction", "probability", "prediction")
}
