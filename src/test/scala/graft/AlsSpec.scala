package graft

import graft.pipeline.{Als, Pipeline}
import org.apache.spark.sql.functions._

/** Implicit-ALS invariants (the Word2Vec §5 pattern: model surfaces
  * are invariant-tested, not hash-oracled).
  */
class AlsSpec extends SparkSpec {

  test("implicit ALS: dimensions, coverage, observed > unobserved scores") {
    val enriched = Pipeline.enrichedEvents(spark, sf("sf0.001"))
    val ratings = Als.implicitRatings(
      enriched.select(col("user_id"), col("item_id"))).cache()
    val model = Als.train(ratings, rank = 8, iters = 5)

    // factor tables cover every user/item, at the requested rank
    assert(model.rank == 8)
    val nItems = ratings.select("item_id").distinct().count()
    val nUsers = ratings.select("user_id").distinct().count()
    assert(model.itemFactors.count() == nItems)
    assert(model.userFactors.count() == nUsers)
    assert(model.itemFactors.select(size(col("features"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(8))

    // ranking sanity: mean predicted preference on OBSERVED pairs must
    // exceed the mean on unobserved (user, item) pairs — the property
    // implicit ALS optimizes
    val observed = model.transform(ratings)
      .agg(avg(col("prediction"))).collect().head.getDouble(0)
    val allPairs = ratings.select("user_id").distinct().limit(50)
      .crossJoin(ratings.select("item_id").distinct().limit(50))
    val unobserved = model
      .transform(allPairs.join(ratings, Seq("user_id", "item_id"), "left_anti"))
      .agg(avg(col("prediction"))).collect().head.getDouble(0)
    assert(observed > unobserved,
      s"observed-pair mean $observed must exceed unobserved $unobserved")

    // same seed + same data + same partitioning => identical factors
    val again = Als.train(ratings, rank = 8, iters = 5)
    val a = model.itemFactors.orderBy("id").collect().map(_.toString).toSeq
    val b = again.itemFactors.orderBy("id").collect().map(_.toString).toSeq
    assert(a == b, "fixed-seed retrain must be bit-identical in-session")
  }

  test("recommendTopK: k rows per user, ranked by score desc") {
    val enriched = Pipeline.enrichedEvents(spark, sf("sf0.001"))
    val ratings = Als.implicitRatings(
      enriched.select(col("user_id"), col("item_id")))
    val model = Als.train(ratings, rank = 4, iters = 3)
    val recs = Als.recommendTopK(model, k = 5).cache()
    val perUser = recs.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      max(col("rn")).as("max_rn")).collect()
    assert(perUser.forall(r => r.getLong(1) == 5L && r.getInt(2) == 5))
    // rn order matches score order within each user
    val bad = recs.as("a").join(recs.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.rn") < col("b.rn") &&
          col("a.score") < col("b.score"))
      .count()
    assert(bad == 0, "rn must rank by descending score")
  }
}
