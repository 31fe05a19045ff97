package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming counterparts of the batch dedup/aggregation operators —
  * the shapes a continuously-ingesting training-data pipeline needs
  * (SURVEY.md §2.10 extension).
  *
  * State discipline at scale: `dropDuplicatesWithinWatermark` keeps one
  * state entry per key only until the watermark passes it (bounded by
  * the ingest rate × watermark horizon, NOT corpus size); windowed
  * counts keep one row per (key, window) until window close + horizon.
  */
object StreamingDedup {

  /** Streaming exact dedup by content fingerprint: emits the first
    * arrival of each `keyCol` value, suppresses later duplicates whose
    * event time is within the watermark horizon. The streaming analogue
    * of [[graft.dedup.Dedup.exact]] — batch keeps min-id per
    * fingerprint, streaming keeps first-seen (arrival order replaces
    * the id tie-break; the SET of surviving fingerprints is identical,
    * which is what the parity spec pins).
    */
  def dedupByKey(stream: DataFrame, keyCol: String, tsCol: String, watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Tumbling-window event counts per key — the streaming form of the
    * batch `groupBy(key, window)` aggregate; append-mode rows are final
    * once the watermark closes the window, so results match the batch
    * computation exactly on bounded input.
    */
  def windowedCounts(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      windowLen: String,
      watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), window(col(tsCol), windowLen).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(keyCol),
        col("w.start").as("window_start"),
        col("n_events"))

  /** Stream-stream interval join (click-attribution shape): each left
    * event joins right events with the same `keyCol` whose event time
    * falls in `(left_ts, left_ts + horizonSeconds]` — strictly after
    * the anchor, at most the horizon later. Both sides carry
    * watermarks, so Spark bounds the join state to
    * watermark + horizon per side instead of buffering the streams
    * forever — the mandatory time-bound for stream-stream joins at
    * scale (an unconstrained join key would keep every row in state).
    *
    * Column contract: left yields (keyCol, l_ts, left event id as
    * `l_id`), right yields (r_ts, `r_id`); the inner join emits one row
    * per attributed pair. Inner joins emit on arrival (no wait for
    * window close), so bounded-input parity with the batch interval
    * join is exact.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      horizonSeconds: Long,
      watermark: String): DataFrame = {
    val l = left
      .select(col(keyCol), col(tsCol).as("l_ts"), col(idCol).as("l_id"))
      .withWatermark("l_ts", watermark)
    val r = right
      .select(col(keyCol).as("__rk"), col(tsCol).as("r_ts"), col(idCol).as("r_id"))
      .withWatermark("r_ts", watermark)
    l.join(
      r,
      col(keyCol) === col("__rk") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizonSeconds SECONDS"),
      "inner")
      .select(col(keyCol), col("l_id"), col("r_id"), col("l_ts"), col("r_ts"))
  }
}
