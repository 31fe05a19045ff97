package graft.pipeline

import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier, LogisticRegression}
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

  /** One sweep measurement: config → its holdout AUC in ppm. */
  final case class SweepPoint(maxDepth: Int, maxIter: Int, validAucPpm: Long)

  /** Deterministic TIME-respecting hyperparameter sweep over GBT
    * (maxDepth, maxIter) — the reference README's open item
    * (`/root/reference/README.md:276` "Hyperparameter tuning for
    * LightGBM, XGBoost, and CatBoost"), done the only way that's sound
    * for prefix-feature ranking data: MLlib's `TrainValidationSplit`
    * splits ROWS at random, which puts a session's later instances in
    * the tuning holdout while earlier ones train — the exact leakage
    * shape the q263 embargo split exists to prevent. So the split here
    * is by instance TIMESTAMP: the earliest `trainPpm` of instances
    * (exact integer ppm order statistic over the day-sharded cumsum —
    * no float rank, no unpartitioned window) train, instances after
    * the cutoff score, and an `embargoSec` gap between them absorbs
    * boundary sessions.
    *
    * Fully deterministic: fixed seed per fit, exact-integer AUC
    * ([[graft.ops.Eval.aucPpm]]), and the winner breaks ties by
    * (auc DESC, maxDepth ASC, maxIter ASC). The grid loop is a
    * driver-side loop over a param-bounded literal — each iteration is
    * a distributed fit, the loop itself is O(|grid|).
    *
    * Returns every measured point plus the winner.
    */
  def timeAwareSweep(
      raw: DataFrame,
      features: Seq[String],
      tsCol: String,
      grid: Seq[(Int, Int)],
      embargoSec: Long = 0L,
      trainPpm: Long = 800000L,
      seed: Long = 42L): (Seq[SweepPoint], SweepPoint) = {
    require(grid.nonEmpty, "sweep grid must be non-empty")
    val (subTrain, subValid) =
      timeSplitAssembled(raw, features, tsCol, embargoSec, trainPpm)
    val points = grid.map { case (depth, iter) =>
      val m = train(subTrain, maxIter = iter, maxDepth = depth, seed = seed)
      // NULL auc = single-class holdout; fail loudly, never rank a 0
      val aucRow = graft.ops.Eval
        .aucPpm(score(m, subValid), col("p1"), "y").head()
      require(!aucRow.isNullAt(aucRow.fieldIndex("auc_ppm")),
        s"timeAwareSweep: degenerate holdout at depth=$depth iter=$iter — " +
          "single-class validation labels make AUC undefined")
      SweepPoint(depth, iter, aucRow.getAs[Long]("auc_ppm"))
    }
    val best = points.sortBy(p => (-p.validAucPpm, p.maxDepth, p.maxIter)).head
    (points, best)
  }

  /** The sweep's timestamp-order-statistic split, shared by every
    * model-selection entry point so no family can be measured on a
    * different holdout: earliest `trainPpm` of instances train (exact
    * integer ppm rank over the day-sharded cumsum — no float rank, no
    * unpartitioned window), instances after the cutoff validate, and
    * `embargoSec` absorbs boundary sessions. Both halves are assembled
    * and eagerly checkpointed: each is consumed by 1+ fits AND the
    * scoring pass.
    */
  private def timeSplitAssembled(
      raw: DataFrame,
      features: Seq[String],
      tsCol: String,
      embargoSec: Long,
      trainPpm: Long): (DataFrame, DataFrame) = {
    val ts = raw.select(col(tsCol).cast("long").as("ts_s"), lit(0L).as("g"))
    val sup = ts.groupBy(col("g"), col("ts_s")).agg(count(lit(1)).as("c"))
    val cums = graft.ops.Windows.shardedCumsumBy(
      sup, Seq("g"), "ts_s", Seq("c"), expr("ts_s div 86400"))
    val nTotal = raw.count()
    val rank = (nTotal * trainPpm + 999999L) / 1000000L
    val cutoff = cums
      .filter(col("cum_c") >= rank)
      .agg(min(col("ts_s")))
      .head().getLong(0)
    val subTrain = assemble(
      raw.filter(col(tsCol).cast("long") <= cutoff - embargoSec), features)
      .localCheckpoint(true)
    val subValid = assemble(raw.filter(col(tsCol).cast("long") > cutoff), features)
      .localCheckpoint(true)
    (subTrain, subValid)
  }

  /** One family's championship measurement: family + params → its
    * holdout AUC and Recall@`recallK`, both exact integer ppm.
    */
  final case class FamilyPoint(
      family: String,
      params: String,
      validAucPpm: Long,
      recallPpm: Long)

  /** Multi-family champion selection — the reference README's last
    * unshipped capability (`/root/reference/README.md:272-275` "Model
    * performance comparison and selection"; its Step-2 trainer
    * `train_classifier_adapted.py` is referenced at `README.md:197`
    * but never ships). Trains a GBT grid and a logistic-regression
    * baseline grid under the SAME [[timeSplitAssembled]] time-respecting
    * split (MLlib's random row splits leak prefix features — the q263
    * rule), scores the SAME holdout, and reports every
    * (family, params) point with exact-integer AUC and Recall@k.
    * Champion = max AUC, ties broken by (family ASC, params ASC) —
    * fully deterministic given fixed seeds.
    *
    * Distributed end-to-end: each fit is an MLlib distributed
    * optimizer over the checkpointed split; the selection loop is a
    * driver loop over the param-bounded grid literal, O(|grid|).
    */
  def championSelect(
      raw: DataFrame,
      features: Seq[String],
      tsCol: String,
      instanceCols: Seq[String],
      candidateCol: String,
      gbtGrid: Seq[(Int, Int)],
      lrRegParams: Seq[Double],
      recallK: Int = 20,
      embargoSec: Long = 0L,
      trainPpm: Long = 800000L,
      seed: Long = 42L): (Seq[FamilyPoint], FamilyPoint) = {
    require(gbtGrid.nonEmpty || lrRegParams.nonEmpty,
      "championSelect needs at least one family point")
    val (subTrain, subValid) =
      timeSplitAssembled(raw, features, tsCol, embargoSec, trainPpm)
    def measure(scored: DataFrame, family: String, params: String): FamilyPoint = {
      // aucPpm returns NULL on a single-class holdout (n_pos = 0 or
      // n_neg = 0); getAs[Long] would silently unbox that to 0 and a
      // degenerate split would rank as a plausible 0-ppm point — fail
      // loudly instead, the split itself is wrong
      val aucRow = graft.ops.Eval.aucPpm(scored, col("p1"), "y").head()
      require(!aucRow.isNullAt(aucRow.fieldIndex("auc_ppm")),
        s"championSelect: degenerate holdout for $family/$params — " +
          "single-class validation labels make AUC undefined; widen the " +
          "split or check the label column")
      val auc = aucRow.getAs[Long]("auc_ppm")
      val rec = graft.ops.Eval
        .recallAtKPpm(scored, instanceCols, "y", col("p1"),
          Seq(candidateCol), recallK)
        .head().getAs[Long]("recall_ppm")
      FamilyPoint(family, params, auc, rec)
    }
    val gbtPoints = gbtGrid.map { case (depth, iter) =>
      val m = train(subTrain, maxIter = iter, maxDepth = depth, seed = seed)
      measure(score(m, subValid), "gbt", f"depth=$depth%02d,iter=$iter%03d")
    }
    val lrPoints = lrRegParams.map { reg =>
      val m = new LogisticRegression()
        .setLabelCol("y")
        .setFeaturesCol("features")
        .setRegParam(reg)
        .setElasticNetParam(0.0)
        .setMaxIter(50)
        .fit(subTrain.withColumn("y", col("y").cast("double")))
      val scored = m.transform(subValid)
        .withColumn("p1", vector_to_array(col("probability")).getItem(1))
        .drop("rawPrediction", "probability", "prediction")
      measure(scored, "lr", f"reg=$reg%.4f")
    }
    val points = gbtPoints ++ lrPoints
    val champion =
      points.sortBy(p => (-p.validAucPpm, p.family, p.params)).head
    (points, champion)
  }
}
