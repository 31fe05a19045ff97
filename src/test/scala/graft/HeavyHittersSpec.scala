package graft

import graft.ops.HeavyHitters
import org.apache.spark.sql.functions._

/** Misra–Gries guarantees — the partitioning-independent properties a
  * pipeline may rely on (exact counter values are order-dependent by
  * construction, like every MG sketch): heavy items always present,
  * estimates within the n/(k+1) undercount bound, and both properties
  * stable under repartitioning.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: item 1 ×500, item 2 ×200, items 100..199 ×3 each
  private def stream = (Seq.fill(500)(1L) ++ Seq.fill(200)(2L) ++
    (100L to 199L).flatMap(i => Seq.fill(3)(i))).toDF("item").withColumn("g", lit(1))

  test("every item above n/(k+1) survives; estimates undercount within bound") {
    val k = 8
    val n = 500 + 200 + 300
    for (parts <- Seq(1, 13)) {
      val sk = stream.repartition(parts)
        .groupBy("g").agg(HeavyHitters.sketch(k)(col("item")).as("sk"))
        .select(explode(col("sk")).as(Seq("item", "est")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sk.size <= k, "sketch exceeded its counter budget")
      assert(sk.contains(1L) && sk.contains(2L),
        s"heavy items missing at $parts partitions: $sk")
      val truth = Map(1L -> 500L, 2L -> 200L).withDefaultValue(3L)
      sk.foreach { case (i, est) =>
        assert(est <= truth(i), s"item $i overestimated: $est > ${truth(i)}")
        assert(truth(i) - est <= n / (k + 1), s"item $i undercounts past the bound")
      }
    }
  }

  test("approx top co-items: anchors' heavy co-items present with bounded undercount") {
    val dir = sf("sf0.001")
    val enriched = graft.pipeline.Pipeline.enrichedEvents(spark, dir)
    val distinctItems = enriched.select(col("session_id"), col("item_id")).distinct()
    val k = 16
    val approx = HeavyHitters
      .approxTopCoitems(distinctItems, "session_id", "item_id", k)
      .cache()
    // exact pair counts via the same row-local enumeration
    val grouped = distinctItems.groupBy("session_id")
      .agg(collect_set(col("item_id")).as("items"))
      .filter(size(col("items")) <= 200)
    val exact = grouped
      .select(explode(col("items")).as("item"), col("items"))
      .select(col("item"), explode(col("items")).as("co_item"))
      .filter(col("item") =!= col("co_item"))
      .groupBy("item", "co_item").agg(count(lit(1)).as("true_count"))
    val joined = approx.join(exact, Seq("item", "co_item"), "full")
      .select(
        col("item"), col("co_item"),
        coalesce(col("est_count"), lit(0L)).as("est"),
        coalesce(col("true_count"), lit(0L)).as("truth"),
        col("n_pairs"))
      .cache()
    // no invented pairs, no overestimates
    assert(joined.filter(col("truth") === 0L).count() == 0, "sketch invented a co-item")
    assert(joined.filter(col("est") > col("truth")).count() == 0, "overestimate")
    // completeness: every co-item with truth > n_pairs/(k+1) must be present
    val anchorTotals = exact.groupBy("item").agg(sum("true_count").as("n_total"))
    val missingHeavy = exact.join(anchorTotals, Seq("item"))
      .join(approx.select(col("item"), col("co_item"), lit(1).as("present")),
        Seq("item", "co_item"), "left")
      .filter(col("present").isNull &&
        col("true_count") > col("n_total") / (k + 1))
      .count()
    assert(missingHeavy == 0, "a heavy co-item fell out of the sketch")
    approx.unpersist(); joined.unpersist()
  }
}
