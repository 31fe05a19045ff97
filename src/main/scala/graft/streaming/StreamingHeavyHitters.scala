package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming windowed heavy hitters — bounded-state "trending items
  * per window" (the continuously-running form of the batch
  * Misra–Gries sketch, [[graft.ops.MisraGriesAggregator]]): each
  * tumbling window keys a `flatMapGroupsWithState` group whose state
  * is an MG(k) counter map + the window's event count, and the
  * window's top items emit ONCE, when the event-time timeout fires at
  * window close.
  *
  * Why not `groupBy(window, item).count` + rank? That state is the
  * full DISTINCT item set per window — exactly the per-window
  * cardinality blowup a trending feed cannot afford on a power-law
  * item stream. MG caps state at k counters per OPEN window,
  * independent of item cardinality, with the standard guarantees:
  * every item with true count > n/(k+1) is present, estimates never
  * exceed truth, undercount ≤ n/(k+1). When a window's distinct-item
  * count stays ≤ k the emitted counts are EXACT — the parity spec's
  * regime.
  *
  * Determinism: MG counter values are encounter-order-dependent
  * (inherent); within one invocation rows are processed in
  * (event_ms, item) ascending order, so a bounded single-batch run is
  * deterministic — the [[StreamingNearDup.updateBucket]] convention.
  *
  * State discipline: one MG map per open window; event-time timeout
  * at `window_end` (clamped above the current watermark so a
  * straggler window still flushes) removes the state on emission —
  * state is bounded by windows-in-flight × k, never by stream age or
  * item cardinality.
  */
object StreamingHeavyHitters {

  case class WindowedItem(
      window_start: Long,
      item: Long,
      event_ms: Long,
      ts: java.sql.Timestamp)
  case class MgState(counters: Map[Long, Long], total: Long)
  case class HeavyRow(
      window_start: java.sql.Timestamp,
      item: Long,
      est_count: Long,
      n_events: Long,
      rn: Int)

  /** The state transition (public: unit-testable without a stream). */
  def updateWindow(k: Int, windowSec: Long)(
      key: Long,
      rows: Iterator[WindowedItem],
      state: GroupState[MgState]): Iterator[HeavyRow] = {
    val mg = new graft.ops.MisraGriesAggregator(k)
    if (state.hasTimedOut) {
      val st = state.getOption.getOrElse(MgState(Map.empty, 0L))
      state.remove()
      st.counters.toSeq
        .sortBy { case (i, c) => (-c, i) }
        .zipWithIndex
        .iterator
        .map { case ((i, c), idx) =>
          HeavyRow(new java.sql.Timestamp(key * 1000L), i, c, st.total, idx + 1)
        }
    } else {
      var st = state.getOption.getOrElse(MgState(Map.empty, 0L))
      rows.toSeq.sortBy(r => (r.event_ms, r.item)).foreach { r =>
        st = MgState(mg.reduce(st.counters, r.item), st.total + 1L)
      }
      state.update(st)
      val windowEndMs = (key + windowSec) * 1000L
      state.setTimeoutTimestamp(math.max(windowEndMs, state.getCurrentWatermarkMs + 1L))
      Iterator.empty
    }
  }

  /** Per-window MG(k) top items over a (ts, item) stream. Output rows
    * (window_start, item, est_count, n_events, rn) emit when the
    * watermark closes each window.
    */
  def topPerWindow(
      events: DataFrame,
      k: Int,
      windowSec: Long,
      watermark: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(
        expr(s"unix_timestamp(ts) div $windowSec * $windowSec").as("window_start"),
        col("item"),
        expr("unix_timestamp(ts) * 1000").as("event_ms"),
        // the watermarked event-time column must survive into the
        // stateful operator's child or the analyzer rejects
        // EventTimeTimeout ("watermark must be specified")
        col("ts"))
      .as[WindowedItem]
      .groupByKey(_.window_start)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateWindow(k, windowSec))
      .toDF()
  }

  /** Bounded-run harness (file source → AvailableNow → memory sink). */
  def runBounded(
      spark: SparkSession,
      parquetPath: String,
      name: String,
      k: Int,
      windowSec: Long,
      watermark: String): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val src = spark.readStream.schema(schema).parquet(parquetPath)
    val q = topPerWindow(src, k, windowSec, watermark)
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
