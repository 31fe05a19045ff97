package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Stream-static enrichment — the continuous form of the reference's J1
  * dimension join (`prepare_training_data_pyspark.py:129-134` joins
  * events to the item-category dim): a streaming fact joined to a
  * static dimension, then watermarked tumbling-window counts per
  * category.
  *
  * Scale shape: a stream-static equi-join is stateless — each
  * micro-batch hash-joins against the (broadcast) static side, so no
  * join state accumulates in the state store; only the windowed
  * aggregate keeps state, and the watermark bounds it to open windows.
  * That is the composition a 100 TB/day feed needs: dimension refreshes
  * swap the static side; the stream never re-shuffles history.
  */
object StreamingEnrich {

  /** The `(ts, item_id)` projection parsed out of the raw props JSON —
    * the single point where the corpus JSON is decoded. Null-item rows
    * are RETAINED so callers can derive whole-stream statistics (the
    * watermark max) from the same frame; the inner dimension join in
    * [[enrichedWindowCountsParsed]] drops them.
    */
  def parsedItems(stream: DataFrame): DataFrame =
    stream.select(
      col("ts"),
      get_json_object(col("props"), "$.k").cast("long").as("item_id"))

  /** Windowed per-category counts over an ALREADY-PARSED
    * `(ts, item_id)` frame. Batch twins checkpoint [[parsedItems]]
    * once and feed dim + counts + watermark max from it (the
    * single-parse rule: each uncached consumer of a raw-JSON
    * projection re-parses the corpus).
    */
  def enrichedWindowCountsParsed(
      parsed: DataFrame,
      dim: DataFrame,
      windowDur: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    parsed
      .filter(col("item_id").isNotNull)
      .join(broadcast(dim), Seq("item_id"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"), col("category_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Windowed per-category counts over the enriched stream. */
  def enrichedWindowCounts(
      stream: DataFrame,
      dim: DataFrame,
      windowDur: String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    enrichedWindowCountsParsed(parsedItems(stream), dim, windowDur, watermark)

  /** Bounded-run harness (same pattern as [[StreamingSessions
    * .runBounded]]): drive a parquet directory through the streaming
    * plan into an in-memory sink, return the completed rows.
    */
  def runBounded(
      spark: SparkSession,
      parquetPath: String,
      dim: DataFrame,
      name: String): DataFrame = {
    val p = java.nio.file.Paths.get(parquetPath)
    val srcPath =
      if (java.nio.file.Files.isRegularFile(p)) {
        val d = java.nio.file.Files.createTempDirectory("stream-src")
        java.nio.file.Files.createSymbolicLink(d.resolve(p.getFileName), p)
        d.toString
      } else parquetPath
    val src = StreamingSessions.eventStream(spark, srcPath)
    val q: StreamingQuery = enrichedWindowCounts(src, dim).writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
