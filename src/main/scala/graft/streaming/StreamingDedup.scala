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
}
