package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming extension of the batch sessionizer
  * (SURVEY.md §2.10): the reference derives sessions offline with
  * window functions; the streaming-native equivalent is
  * `session_window(ts, gap)` + watermark, which matches the 30-minute
  * gap rule's semantics for on-time data.
  *
  * At scale this is the shape that keeps state bounded: watermark
  * evicts closed sessions; state is keyed by (user, session window) and
  * lives in the state store, not the heap.
  */
object StreamingSessions {

  /** Base schema TEMPLATE: the `ts` field here is a placeholder slot —
    * [[eventStream]] overrides it with the type probed from the source
    * parquet footer (LongType for TIMESTAMP(NANOS) generations read via
    * `nanosAsLong`, TimestampNTZType for TIMESTAMP(MICROS, NTZ) ones)
    * and normalizes to a µs TimestampType before windowing.
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming events source with `ts` normalized to a µs
    * TimestampType — the streaming sibling of
    * [[graft.core.Tables.events]]. The events data has shipped as
    * TIMESTAMP(NANOS) (read as long via `nanosAsLong`, floor-divided
    * to µs) and as TIMESTAMP(MICROS, NTZ) (cast NTZ → LTZ;
    * instant-preserving under the UTC session timezone all graft
    * sessions set), so the reader probes the footer with a static read
    * and adapts the explicit streaming schema to match.
    *
    * The probe requires `srcPath` to be NON-EMPTY at stream start (an
    * empty directory has no footer to probe and the static read
    * throws); when the probe fails we fall back to the LongType
    * template so an initially-empty directory still starts, matching
    * the pre-probe behavior.
    */
  def eventStream(spark: SparkSession, srcPath: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val tsType =
      try spark.read.parquet(srcPath).schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException => LongType }
    val schema = StructType(eventSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    val raw = spark.readStream.schema(schema).parquet(srcPath)
    tsType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Per-session aggregate over a streaming source: one output row per
    * closed (user, session) with event count, value sum, bounds.
    */
  def sessionAggregates(
      stream: DataFrame,
      gapMinutes: Int = 30,
      watermark: String = "1 hour"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(
        col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("session"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("value_sum"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))

  /** Stream-stream session merge (the streaming family's last missing
    * shape — two watermarked streams sessionized JOINTLY): each feed is
    * tagged with its source and the union is sessionized with one
    * session_window. Under Spark's multi-watermark policy the union's
    * event-time watermark is the MIN of the two feeds' watermarks, so a
    * merged session closes only when BOTH feeds have advanced past its
    * end — exactly the semantics a cross-feed session needs (a lagging
    * transaction feed must be able to extend a session the view feed
    * already moved past).
    *
    * Inputs need (user_id, ts[, value]); output is one row per closed
    * (user, session): per-source event counts, total, and exact-micros
    * session bounds (end = last event + gap — the session_window rule:
    * a gap EQUAL to the duration merges, strictly greater splits).
    *
    * At scale: state is (user, open-session) keyed in the state store,
    * bounded by watermark eviction; the union shuffles once on user_id
    * — no stream-stream join state (the merge is a groupBy, not a
    * join), which is what keeps two 100 TB/day feeds tractable.
    */
  def mergedSessionAggregates(
      streamA: DataFrame,
      streamB: DataFrame,
      gapMinutes: Int = 30,
      watermark: String = "1 hour"): DataFrame = {
    def tag(df: DataFrame, isA: Int): DataFrame =
      df.select(col("user_id"), col("ts"), lit(isA.toLong).as("is_a"))
        .withWatermark("ts", watermark)
    tag(streamA, 1)
      .unionByName(tag(streamB, 0))
      .groupBy(
        col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("session"))
      .agg(
        sum(col("is_a")).as("n_a"),
        sum(lit(1L) - col("is_a")).as("n_b"),
        count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
  }

  /** Drive a bounded parquet directory through the streaming
    * sessionizer into an in-memory table; returns the completed result.
    * (Local harness for tests — production would writeStream to a sink
    * with a real trigger.)
    */
  def runBounded(spark: SparkSession, parquetPath: String, name: String): DataFrame = {
    val src = eventStream(spark, wrapFile(parquetPath))
    val q: StreamingQuery = sessionAggregates(src)
      .select(
        col("user_id"),
        col("session.start").as("session_start"),
        col("session.end").as("session_end"),
        col("n_events"),
        col("value_sum"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** FileStreamSource wants a directory; wrap a bare parquet file in a
    * tmp dir of symlinks so callers can point at a single file.
    */
  private def wrapFile(parquetPath: String): String = {
    val p = java.nio.file.Paths.get(parquetPath)
    if (java.nio.file.Files.isRegularFile(p)) {
      val d = java.nio.file.Files.createTempDirectory("stream-src")
      java.nio.file.Files.createSymbolicLink(d.resolve(p.getFileName), p)
      d.toString
    } else parquetPath
  }

  /** Bounded harness for [[mergedSessionAggregates]]: splits one
    * bounded event directory into a view feed and a purchase feed (two
    * independent streaming sources — separate watermarks, exactly the
    * production two-feed topology), merges, and completes into an
    * in-memory table.
    */
  def runBoundedMerged(spark: SparkSession, parquetPath: String, name: String): DataFrame = {
    val dir = wrapFile(parquetPath)
    def feed(t: String): DataFrame =
      eventStream(spark, dir).filter(col("event_type") === t)
    val q: StreamingQuery = mergedSessionAggregates(feed("view"), feed("purchase"))
      .select(
        col("user_id"),
        unix_micros(col("session.start")).as("s_start_us"),
        unix_micros(col("session.end")).as("s_end_us"),
        col("n_a").as("n_view"),
        col("n_b").as("n_purchase"),
        col("n_events"))
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
