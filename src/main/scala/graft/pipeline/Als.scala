package graft.pipeline

import org.apache.spark.ml.recommendation.{ALS => MlAls, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Implicit-feedback ALS (Hu/Koren/Volinsky 2008) over the event log —
  * the collaborative-filtering complement to the reference's
  * co-visitation candidates (`prepare_training_data_pyspark.py:250-329`
  * builds item-item counts; ALS factorizes the same interaction matrix
  * into dense user/item embeddings). Distributed MLlib implementation:
  * the ratings matrix is block-partitioned, each least-squares solve
  * touches only its in/out blocks — the textbook 100 TB-scale shape
  * (no driver-side matrix ever materializes).
  *
  * Determinism: fixed seed + fixed partitioning reproduce factors
  * bit-for-bit in-session; across cluster layouts the factors vary at
  * solver precision, so (like Word2Vec vectors, SURVEY.md §5) the
  * model surface is spec-verified by invariants rather than
  * hash-oracled: dimensions, coverage, and ranking quality (observed
  * pairs must out-score unobserved pairs).
  */
object Als {

  /** Implicit ratings = interaction counts per (user, item). */
  def implicitRatings(events: DataFrame): DataFrame =
    events
      .filter(col("item_id").isNotNull)
      .groupBy(col("user_id"), col("item_id"))
      .agg(count(lit(1)).cast("float").as("cnt"))

  /** Train implicit ALS on (user_id, item_id, cnt). */
  def train(
      ratings: DataFrame,
      rank: Int = 8,
      iters: Int = 5,
      regParam: Double = 0.1,
      alpha: Double = 40.0,
      seed: Long = 42L): ALSModel =
    new MlAls()
      .setUserCol("user_id")
      .setItemCol("item_id")
      .setRatingCol("cnt")
      .setImplicitPrefs(true)
      .setRank(rank)
      .setMaxIter(iters)
      .setRegParam(regParam)
      .setAlpha(alpha)
      .setSeed(seed)
      .setColdStartStrategy("drop")
      .fit(ratings)

  /** Top-k item recommendations per user as flat rows
    * (user_id, item_id, score, rn).
    */
  def recommendTopK(model: ALSModel, k: Int): DataFrame =
    model
      .recommendForAllUsers(k)
      .select(col("user_id"), posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(
        col("user_id"),
        col("rec.item_id").as("item_id"),
        col("rec.rating").as("score"),
        (col("pos") + 1).as("rn"))
}
