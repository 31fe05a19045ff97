package graft

import graft.streaming.StreamingHeavyHitters
import org.apache.spark.sql.functions._

/** Streaming windowed Misra–Gries heavy hitters: exact parity with
  * batch counts when a window's distinct items fit the sketch, the MG
  * bounds when they don't, and watermark-driven window closing.
  */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(path: String): Unit = {
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(offsetS: Long) = new java.sql.Timestamp(base.getTime + offsetS * 1000)
    // window A [10:00,10:10): 3 distinct items (≤ k=5 -> exact):
    // item 1 ×6, item 2 ×3, item 3 ×1
    val winA = (0 until 6).map(i => (at(i * 10), 1L)) ++
      (0 until 3).map(i => (at(100 + i * 10), 2L)) ++ Seq((at(200), 3L))
    // window B [10:10,10:20): 20 distinct items, one dominant:
    // item 99 ×30, items 0..19 once each -> n=50, k=5: 99 must surface
    val winB = (0 until 30).map(i => (at(600 + i), 99L)) ++
      (0 until 20).map(i => (at(650 + i), i.toLong))
    // tail pushes the watermark past both windows
    val tail = Seq((at(9000), 7L))
    (winA ++ winB ++ tail).toDF("ts", "item")
      .write.mode("overwrite").parquet(path)
  }

  test("exact regime: emitted counts equal batch counts, ranked (count desc, item)") {
    val path = "/tmp/graft-test/stream_hh_fixture"
    fixture(path)
    val out = StreamingHeavyHitters
      .runBounded(spark, path, "stream_hh_spec", k = 5, windowSec = 600L, watermark = "10 minutes")
      .collect()
      .groupBy(_.getAs[java.sql.Timestamp]("window_start").toString)

    val winA = out("2026-01-01 10:00:00.0")
      .map(r => (r.getAs[Int]("rn"), r.getAs[Long]("item"), r.getAs[Long]("est_count"), r.getAs[Long]("n_events")))
      .sortBy(_._1)
    assert(winA.toSeq == Seq((1, 1L, 6L, 10L), (2, 2L, 3L, 10L), (3, 3L, 1L, 10L)),
      s"window A must be exact (3 distinct <= k): $winA")
  }

  test("sketch regime: dominant item surfaces with MG bounds; state emits once per window") {
    val path = "/tmp/graft-test/stream_hh_fixture2"
    fixture(path)
    val out = StreamingHeavyHitters
      .runBounded(spark, path, "stream_hh_spec2", k = 5, windowSec = 600L, watermark = "10 minutes")
    val winB = out.filter(col("window_start") === lit(java.sql.Timestamp.valueOf("2026-01-01 10:10:00")))
      .collect()
      .map(r => r.getAs[Long]("item") -> (r.getAs[Long]("est_count"), r.getAs[Long]("n_events")))
      .toMap
    assert(winB.nonEmpty && winB.size <= 5, s"at most k rows per window: $winB")
    // n=50, k=5: any item with true count > 50/6 ≈ 8.3 MUST be present
    assert(winB.contains(99L), s"dominant item evicted: $winB")
    val (est, n) = winB(99L)
    assert(n == 50L)
    assert(est <= 30L, "MG never overestimates")
    assert(30L - est <= 50L / 6L + 1L, s"undercount beyond n/(k+1): est=$est")
    // the tail window (not closed by the watermark) must not emit
    val tailRows = out.filter(col("window_start") >= lit(java.sql.Timestamp.valueOf("2026-01-01 12:00:00"))).count()
    assert(tailRows == 0L, "unclosed window leaked")
  }

  test("updateWindow: timeout emits ranked rows and clears state") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def state(s: Option[StreamingHeavyHitters.MgState], timedOut: Boolean) =
      TestGroupState.create(
        org.apache.spark.api.java.Optional.fromNullable(s.orNull),
        GroupStateTimeout.EventTimeTimeout,
        0L, org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(0L)), hasTimedOut = timedOut)
    def rows(items: Long*) = items.zipWithIndex.iterator
      .map { case (i, idx) =>
        StreamingHeavyHitters.WindowedItem(600L, i, idx.toLong, new java.sql.Timestamp(600000L))
      }

    val st1 = state(None, timedOut = false)
    val none = StreamingHeavyHitters.updateWindow(3, 600L)(600L, rows(5L, 5L, 9L), st1)
    assert(none.isEmpty, "no emission before the window closes")
    assert(st1.get.total == 3L && st1.get.counters == Map(5L -> 2L, 9L -> 1L))

    val st2 = state(Some(st1.get), timedOut = true)
    val out = StreamingHeavyHitters.updateWindow(3, 600L)(600L, Iterator.empty, st2).toList
    assert(out.map(r => (r.rn, r.item, r.est_count)) == List((1, 5L, 2L), (2, 9L, 1L)))
    assert(!st2.exists, "state must be removed on emission")
  }
}
