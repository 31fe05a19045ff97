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
    val p = java.nio.file.Paths.get(s"$dir/events.parquet")
    val d = java.nio.file.Files.createTempDirectory("stream-src")
    java.nio.file.Files.createSymbolicLink(d.resolve(p.getFileName), p)
    StreamingSessions.eventStream(spark, d.toString)
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

  test("stream-stream interval join equals the batch interval join") {
    val views = streamEvents(sf("sf0.001")).filter(col("event_type") === "view")
    val purchases = streamEvents(sf("sf0.001")).filter(col("event_type") === "purchase")
    val streamed = runToTable(
      StreamingDedup.intervalJoin(
        views, purchases, "user_id", "ts", "event_id",
        horizonSeconds = 3600L, watermark = "1 hour"),
      "ssjoin_out")

    val ev = graft.core.Tables.events(spark, sf("sf0.001"))
    val l = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_id"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("rk"), col("ts").as("r_ts"), col("event_id").as("r_id"))
    val batch = l.join(
      r,
      col("user_id") === col("rk") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 3600 SECONDS"),
      "inner")
    assert(batch.count() > 0, "fixture has no attributable view->purchase pairs")
    assert(streamed.count() == batch.count())
    val sPairs = streamed.select("l_id", "r_id")
      .collect().map(row => (row.getLong(0), row.getLong(1))).sorted.toSeq
    val bPairs = batch.select("l_id", "r_id")
      .collect().map(row => (row.getLong(0), row.getLong(1))).sorted.toSeq
    assert(sPairs == bPairs)
  }
}
