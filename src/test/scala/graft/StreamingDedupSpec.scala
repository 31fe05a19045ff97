package graft

import graft.streaming.{StreamingDedup, StreamingSessions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Batch-parity tests for the streaming dedup/count operators: driving
  * the bounded events parquet through the streaming plan must agree
  * with the equivalent batch computation.
  */
class StreamingDedupSpec extends SparkSpec {

  private def streamEvents(dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val p = java.nio.file.Paths.get(s"$dir/events.parquet")
    val d = java.nio.file.Files.createTempDirectory("stream-src")
    java.nio.file.Files.createSymbolicLink(d.resolve(p.getFileName), p)
    spark.readStream
      .schema(StreamingSessions.eventSchema)
      .parquet(d.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  private def runToTable(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  test("streaming dedup: surviving key set equals batch distinct set") {
    val streamed = runToTable(
      StreamingDedup.dedupByKey(
        streamEvents(sf("sf0.001")), "user_id", "ts", watermark = "1 hour"),
      "dedup_out")
    val batch = graft.core.Tables.events(spark, sf("sf0.001"))
      .select("user_id").distinct()
    assert(streamed.select("user_id").distinct().count() == streamed.count(),
      "streaming dedup emitted a duplicate key")
    assert(
      streamed.select("user_id").collect().map(_.getLong(0)).sorted.toSeq ==
        batch.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("streaming windowed counts equal batch on watermark-closed windows") {
    val streamed = runToTable(
      StreamingDedup.windowedCounts(
        streamEvents(sf("sf0.001")), "event_type", "ts",
        windowLen = "1 day", watermark = "1 hour"),
      "wcount_out")
    // Append mode emits a window only once the watermark passes its
    // end; when the bounded stream stops, the final watermark sits at
    // max(ts) - 1 hour, so windows still open at that point (the last
    // day) correctly never emit. Batch side mirrors that cutoff.
    val events = graft.core.Tables.events(spark, sf("sf0.001"))
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    val batch = events
      .groupBy(
        col("event_type"),
        window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("w.end") <= lit(new java.sql.Timestamp(maxTs.getTime - 3600 * 1000L)))
      .select(col("event_type"), col("w.start").as("window_start"), col("n_events"))
    val s = streamed.orderBy("event_type", "window_start").collect().toSeq
    val b = batch.orderBy("event_type", "window_start").collect().toSeq
    assert(s == b, s"streaming ${s.length} rows vs batch ${b.length}")
  }
}
