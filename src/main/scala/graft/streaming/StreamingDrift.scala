package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor — the continuously-running
  * form of the batch PSI audit (q118): tumbling event-time windows of
  * a numeric stream are binned into a fixed histogram and each CLOSED
  * window's distribution is scored against a static REFERENCE
  * histogram (the profile a training run was admitted under). The
  * emitted row is the alert a feature-store or ingest pipeline pages
  * on when upstream drift would silently poison the next model.
  *
  * Design points:
  *   - ONE stateful operator: the per-window bin counts are
  *     conditional sums inside a single windowed aggregation (bins as
  *     columns, not rows), so append mode needs no chained stateful
  *     aggs and the state per window is a fixed `nBins`-wide row.
  *   - The reference enters as PLAN CONSTANTS (a profiling job's
  *     histogram is driver-small by definition); its probabilities
  *     constant-fold into the PSI projection — no stream-static join,
  *     nothing to re-broadcast per micro-batch.
  *   - PSI uses the q118 conventions: Laplace +1 per bin on BOTH
  *     sides, psi_micro = round(Σ (p_cur−p_ref)·ln(p_cur/p_ref)·10⁶).
  *   - Batch parity: the same function on a batch DataFrame computes
  *     the identical per-window scores (`withWatermark` is a no-op in
  *     batch); the spec mirrors append mode's watermark cutoff.
  *
  * At scale the windowed agg partial-aggregates map-side per
  * micro-batch and keeps one fixed-width state row per (window) —
  * state is bounded by windows-in-flight, never by event volume.
  */
object StreamingDrift {

  /** Per-window PSI vs `reference` (histogram counts for bins
    * 0..reference.size-1; bin = clamp(floor(value / binWidth))).
    * Output per closed window: (window_start, window_end, n_events,
    * n_invalid, psi_micro, alert) — n_events counts only VALID
    * (non-null, non-NaN) values; n_invalid counts the rest.
    */
  def psiPerWindow(
      events: DataFrame,
      reference: Seq[Long],
      windowDur: String,
      watermark: String,
      binWidth: Double,
      alertMicro: Long): DataFrame = {
    require(reference.nonEmpty, "reference histogram must have at least one bin")
    val nBins = reference.size
    // NULL/NaN values would land in NO bin while still counting toward
    // the window total — the p vector stops summing to 1 and a 90%-
    // broken feed scores PSI ≈ 0. Bin only VALID values; surface the
    // invalid count as its own column so a schema break is visible
    // (and should be alerted on) even though it has no reference bin.
    val valid = col("value").isNotNull && !isnan(col("value"))
    val bin = when(
      valid,
      least(
        greatest(floor(col("value") / binWidth), lit(0.0)),
        lit((nBins - 1).toDouble)).cast("int"))

    val counts = (0 until nBins).map(b =>
      sum(when(bin === b, 1L).otherwise(0L)).as(s"c$b"))
    val agged = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"))
      .agg(
        sum(when(valid, 1L).otherwise(0L)).as("n_events"),
        sum(when(valid, 0L).otherwise(1L)).as("n_invalid") +: counts: _*)

    val tRef = reference.map(_ + 1L).sum.toDouble
    val tCur = col("n_events").cast("double") + lit(nBins.toDouble) // Laplace mass
    val psi: Column = (0 until nBins)
      .map { b =>
        val pCur = (col(s"c$b").cast("double") + lit(1.0)) / tCur
        val pRef = lit((reference(b) + 1L).toDouble / tRef)
        (pCur - pRef) * log(pCur / pRef)
      }
      .reduce(_ + _)

    agged.select(
      col("w.start").as("window_start"),
      col("w.end").as("window_end"),
      col("n_events"),
      col("n_invalid"),
      round(psi * lit(1000000.0)).cast("long").as("psi_micro"))
      .withColumn("alert", col("psi_micro") > lit(alertMicro))
  }

  /** Bounded-run harness (file source → AvailableNow → memory sink;
    * the [[StreamingNearDup.runBounded]] convention) over a parquet of
    * (ts timestamp, value double) rows.
    */
  def runBounded(
      spark: org.apache.spark.sql.SparkSession,
      parquetPath: String,
      name: String,
      reference: Seq[Long],
      windowDur: String,
      watermark: String,
      binWidth: Double,
      alertMicro: Long): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val src = spark.readStream.schema(schema).parquet(parquetPath)
    val q = psiPerWindow(src, reference, windowDur, watermark, binWidth, alertMicro)
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory")
      .queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
