package graft

import graft.streaming.StreamingIntervalJoin
import org.apache.spark.sql.functions._

/** Stream-stream interval join parity: the continuous click→purchase
  * attach must emit EXACTLY the batch interval-join pair set — inner
  * stream-stream joins emit on match, so unlike windowed aggregation
  * there is no withheld watermark tail to mirror.
  */
class StreamingIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("stream-stream interval join emits exactly the batch pair set") {
    val dir = sf("sf0.001")
    val events = graft.core.Tables.events(spark, dir)

    val streamed = StreamingIntervalJoin
      .runBounded(spark, s"$dir/events.parquet", "stream_interval_spec")
      .select(col("purchase_id"), col("click_id"))
      .as[(Long, Long)].collect().toSet

    val c = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("click_id"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    val batch = p.join(c, Seq("user_id"))
      .filter(col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("interval 30 minutes"))
      .select(col("purchase_id"), col("click_id"))
      .as[(Long, Long)].collect().toSet

    assert(batch.nonEmpty, "fixture must produce at least one pair")
    assert(streamed == batch)
  }

  test("left-outer interval join: null rows are watermark-gated and agree with the q309 twin") {
    val dir = sf("sf0.001")
    val events = graft.core.Tables.events(spark, dir)

    val streamed = StreamingIntervalJoin
      .runBounded(spark, s"$dir/events.parquet", "stream_outer_spec", leftOuter = true)
      .cache()
    // matched rows: exactly the inner pair set (outer adds, never drops)
    val inner = streamed.filter(col("click_id").isNotNull)
      .select(col("purchase_id"), col("click_id")).as[(Long, Long)].collect().toSet
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("click_id"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    val batchPairs = p.join(c, Seq("user_id"))
      .filter(col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("interval 30 minutes"))
      .select(col("purchase_id"), col("click_id")).as[(Long, Long)].collect().toSet
    assert(inner == batchPairs)

    // every q309 twin row (closed unattributed purchase) must have been
    // emitted as a null row by the real stream
    val twin = graft.queries.EventQueries
      .streamUnattributedPurchases(spark, dir).cache()
    assert(twin.count() > 0, "twin emitted nothing at sf0.001")
    val streamedNulls = streamed.filter(col("click_id").isNull)
      .select(col("purchase_id"))
    val missing = twin.select(col("purchase_id"))
      .join(streamedNulls, Seq("purchase_id"), "left_anti").count()
    assert(missing == 0, "closed unattributed purchase missing from the stream's null rows")
    // and every streamed null row is genuinely unattributed in batch
    val phantom = streamedNulls
      .join(batchPairs.map(_._1).toSeq.toDF("purchase_id"), Seq("purchase_id"), "left_semi")
      .count()
    assert(phantom == 0, "stream emitted a null row for a purchase that HAS a click match")
  }

  test("full-outer interval join: both null sides watermark-gated, agree with the q310 twin") {
    val dir = sf("sf0.001")
    val events = graft.core.Tables.events(spark, dir)

    val streamed = StreamingIntervalJoin
      .runBounded(spark, s"$dir/events.parquet", "stream_full_spec", fullOuter = true)
      .cache()
    // matched rows: exactly the inner pair set (outer adds, never drops)
    val inner = streamed
      .filter(col("click_id").isNotNull && col("purchase_id").isNotNull)
      .select(col("purchase_id"), col("click_id")).as[(Long, Long)].collect().toSet
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("click_id"))
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    val batchPairs = p.join(c, Seq("user_id"))
      .filter(col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("interval 30 minutes"))
      .select(col("purchase_id"), col("click_id")).as[(Long, Long)].collect().toSet
    assert(inner == batchPairs)

    // every q310 twin row must have been emitted by the real stream —
    // on both null sides (the twin's gates are the operator's per-side
    // state-watermark closes, so twin ⊆ stream must hold exactly)
    val twin = graft.queries.EventQueries
      .streamAttributionLedger(spark, dir).cache()
    val twinNullClicks = twin.filter(col("click_id").isNull).select(col("purchase_id"))
    val twinNullPurchases = twin.filter(col("purchase_id").isNull).select(col("click_id"))
    assert(twinNullClicks.count() > 0, "twin emitted no unattributed purchases at sf0.001")
    assert(twinNullPurchases.count() > 0, "twin emitted no browse-no-buy clicks at sf0.001")
    val missingP = twinNullClicks
      .join(streamed.filter(col("click_id").isNull).select(col("purchase_id")),
        Seq("purchase_id"), "left_anti").count()
    assert(missingP == 0, "closed unattributed purchase missing from stream null rows")
    val missingC = twinNullPurchases
      .join(streamed.filter(col("purchase_id").isNull).select(col("click_id")),
        Seq("click_id"), "left_anti").count()
    assert(missingC == 0, "closed browse-no-buy click missing from stream null rows")
    // no phantom: a streamed null row must be genuinely unmatched in batch
    val phantomP = streamed.filter(col("click_id").isNull).select(col("purchase_id"))
      .join(batchPairs.map(_._1).toSeq.toDF("purchase_id"), Seq("purchase_id"), "left_semi")
      .count()
    val phantomC = streamed.filter(col("purchase_id").isNull).select(col("click_id"))
      .join(batchPairs.map(_._2).toSeq.toDF("click_id"), Seq("click_id"), "left_semi")
      .count()
    assert(phantomP == 0, "stream emitted a purchase null row that HAS a match")
    assert(phantomC == 0, "stream emitted a click null row that HAS a match")
  }

  test("chained topology: full-outer join -> window agg, zero phantom / zero dropped vs batch twin") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = sf("sf0.001")
    // single-file feed => one data batch + watermark-finalize batches;
    // multi-batch replay dynamics are ProbeStreamSoak's job (x100)
    val srcDir = {
      val p = java.nio.file.Paths.get(s"$dir/events.parquet")
      val d = java.nio.file.Files.createTempDirectory("chain-src")
      java.nio.file.Files.createSymbolicLink(d.resolve(p.getFileName), p)
      d.toString
    }
    def feed(t: String) =
      graft.streaming.StreamingSessions.eventStream(spark, srcDir)
        .filter(col("event_type") === t)
    val q = StreamingIntervalJoin
      .attributionWindowCounts(feed("click"), feed("purchase"))
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("ws_us"),
        unix_micros(col("w.end")).as("we_us"),
        col("n_attributed"), col("n_organic"))
      .writeStream
      .format("memory").queryName("chain_spec")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("chain_spec")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    val ev = graft.core.Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
    def batchFeed(t: String) = ev.filter(col("event_type") === t)
    val batch = StreamingIntervalJoin
      .attributionWindowCounts(batchFeed("click"), batchFeed("purchase"))
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("ws_us"),
        unix_micros(col("w.end")).as("we_us"),
        col("n_attributed"), col("n_organic"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    // W = min(click max − 1 h, purchase max − 30 min); downstream agg
    // watermark is delayed by the join's organic emission lag (lookback)
    val w = ev
      .agg(least(
        max(when(col("event_type") === "click", unix_micros(col("ts")))) - 3600000000L,
        max(when(col("event_type") === "purchase", unix_micros(col("ts")))) - 1800000000L))
      .as[Long].head()
    val mustEmit = batch.filter(_._3 <= w - 1800000000L)
    assert(mustEmit.nonEmpty, "fixture must close at least one window")
    assert((streamed -- batch).isEmpty, "phantom rows vs the batch twin")
    assert((mustEmit -- streamed).isEmpty, "watermark-closed window not emitted")
  }
}
