package graft

import graft.streaming.StreamingDrift
import org.apache.spark.sql.functions._

/** Windowed streaming PSI drift monitor: a reference-matching window
  * must score ~0 (no alert), a concentrated window must alert, the
  * watermark withholds unclosed windows, and batch parity holds on the
  * emitted subset (the q118 PSI arithmetic, per window).
  */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private val ref = Seq(10L, 10L, 10L, 10L)

  private def fixture(path: String): Unit = {
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(offsetS: Long) = new java.sql.Timestamp(base.getTime + offsetS * 1000)
    // window A [10:00,10:10): 40 events matching the reference exactly
    val winA = for (b <- 0 until 4; i <- 0 until 10)
      yield (at(b * 60 + i), b * 25.0 + 10.0)
    // window B [10:10,10:20): 40 events all in bin 3 — hard drift
    val winB = (0 until 40).map(i => (at(600 + i), 85.0))
    // tail event pushes the final watermark past both windows but not
    // its own (12:30 − 10m = 12:20 ≥ 10:20, < 12:40)
    val tail = Seq((at(9000), 10.0))
    (winA ++ winB ++ tail).toDF("ts", "value")
      .write.mode("overwrite").parquet(path)
  }

  test("drift monitor: matching window silent, drifted window alerts, tail withheld") {
    val path = "/tmp/graft-test/streaming_drift_fixture"
    fixture(path)
    val out = StreamingDrift
      .runBounded(spark, path, "stream_drift_spec", ref,
        windowDur = "10 minutes", watermark = "10 minutes",
        binWidth = 25.0, alertMicro = 100000L)
      .collect()
      .map(r => r.getAs[java.sql.Timestamp]("window_start").toString ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("psi_micro"), r.getAs[Boolean]("alert")))
      .toMap

    assert(out.size == 2, s"exactly the two closed windows emit, got $out")
    val (nA, psiA, alertA) = out("2026-01-01 10:00:00.0")
    assert(nA == 40L && psiA == 0L && !alertA,
      s"reference-matching window must score exactly 0 (Laplace-identical), got $psiA")
    val (nB, psiB, alertB) = out("2026-01-01 10:10:00.0")
    assert(nB == 40L && psiB > 2000000L && alertB,
      s"concentrated window must alert hard, got $psiB")
  }

  test("null/NaN values are surfaced as n_invalid, not silently diluted into PSI") {
    val path = "/tmp/graft-test/streaming_drift_nulls"
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(offsetS: Long) = new java.sql.Timestamp(base.getTime + offsetS * 1000)
    // 10 valid reference-matching values + 90 nulls in one window
    val valid = for (b <- 0 until 4; i <- 0 until (if (b < 2) 3 else 2))
      yield (at(b * 60 + i), Some(b * 25.0 + 10.0))
    val nulls = (0 until 90).map(i => (at(300 + i), None: Option[Double]))
    val tail = Seq((at(9000), Some(10.0)))
    (valid ++ nulls ++ tail).toDF("ts", "value").write.mode("overwrite").parquet(path)
    val out = StreamingDrift
      .runBounded(spark, path, "stream_drift_nulls", ref,
        windowDur = "10 minutes", watermark = "10 minutes",
        binWidth = 25.0, alertMicro = 100000L)
      .filter(col("window_start") === lit(java.sql.Timestamp.valueOf("2026-01-01 10:00:00")))
      .head()
    assert(out.getAs[Long]("n_events") == 10L, "n_events must count valid values only")
    assert(out.getAs[Long]("n_invalid") == 90L, "the schema break must be visible")
    // the 10 valid values are near-uniform across bins: PSI itself stays small
    assert(math.abs(out.getAs[Long]("psi_micro")) < 100000L)
  }

  test("batch parity on the watermark-closed subset") {
    val path = "/tmp/graft-test/streaming_drift_fixture2"
    fixture(path)
    val streamed = StreamingDrift
      .runBounded(spark, path, "stream_drift_spec2", ref,
        windowDur = "10 minutes", watermark = "10 minutes",
        binWidth = 25.0, alertMicro = 100000L)
      .select("window_start", "n_events", "psi_micro", "alert")
      .as[(java.sql.Timestamp, Long, Long, Boolean)].collect().toSet

    val batchAll = StreamingDrift.psiPerWindow(
      spark.read.parquet(path), ref,
      windowDur = "10 minutes", watermark = "10 minutes",
      binWidth = 25.0, alertMicro = 100000L)
    // mirror append mode's cutoff: windows whose end ≤ max_ts − watermark
    val maxTs = spark.read.parquet(path).agg(max(col("ts"))).as[java.sql.Timestamp].head()
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 600 * 1000)
    val batch = batchAll
      .filter(col("window_end") <= lit(cutoff))
      .select("window_start", "n_events", "psi_micro", "alert")
      .as[(java.sql.Timestamp, Long, Long, Boolean)].collect().toSet

    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"parity broken: stream-only=${streamed -- batch} batch-only=${batch -- streamed}")
  }
}
