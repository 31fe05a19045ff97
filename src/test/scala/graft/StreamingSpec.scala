package graft

import graft.ops.Windows
import graft.streaming.StreamingSessions
import org.apache.spark.sql.functions._

/** Batch/streaming parity: `session_window(gap)` over the bounded
  * events stream must agree with the batch lag/running-sum sessionizer
  * (SURVEY.md §2.10) on every session it emits. In append mode a
  * bounded run only FLUSHES sessions the final watermark has passed, so
  * the emitted set is a subset; the test checks (a) exact agreement on
  * that subset and (b) every unemitted batch session sits in the
  * watermark tail (end within watermark+gap of max event time).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming session_window agrees with batch gap-rule sessionization") {
    val dir = sf("sf0.001")
    val streamed = StreamingSessions
      .runBounded(spark, s"$dir/events.parquet", "stream_sessions_spec")
      .select(
        col("user_id"),
        unix_timestamp(col("session_start")).as("start_s"),
        // session.end = last event + gap; undo the gap to get last-event second
        (unix_timestamp(col("session_end")) - 1800L).as("end_s"),
        col("n_events"))
      .cache()
    val batch = Windows
      .sessionize(graft.core.Tables.events(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id")))
      .groupBy(col("session_id"), col("user_id"))
      .agg(
        min(col("epoch_s")).as("start_s"),
        max(col("epoch_s")).as("end_s"),
        count(lit(1)).as("n_events"))
      .drop("session_id")
      .cache()

    val keys = Seq("user_id", "start_s", "end_s", "n_events")
    // (a) every emitted streaming session matches a batch session exactly
    val matched = streamed.join(batch, keys, "left_semi").count()
    assert(matched == streamed.count(), "streaming emitted a session batch doesn't have")
    assert(streamed.count() > 0)

    // (b) batch sessions missing from the stream are only in the
    // unflushed watermark tail (1h watermark + 30min gap)
    val maxTs = batch.agg(max(col("end_s"))).as[Long].head()
    val missingEarly = batch
      .join(streamed, keys, "left_anti")
      .filter(col("end_s") < maxTs - 3600L - 1800L)
      .count()
    assert(missingEarly == 0, "non-tail session missing from streaming output")
  }

  test("stream-stream merged sessionization agrees with the q307 batch twin") {
    val dir = sf("sf0.001")
    val streamed = StreamingSessions
      .runBoundedMerged(spark, s"$dir/events.parquet", "merged_sessions_spec")
      .cache()
    // the contract twin imposes the closed-session cutoff (min per-feed
    // max − watermark); everything it emits must be in the streamed set
    val twin = graft.queries.EventQueries
      .streamMergedSessions(spark, dir)
      .cache()
    val keys = Seq("user_id", "s_start_us", "s_end_us",
      "n_view", "n_purchase", "n_events")
    assert(twin.count() > 0, "twin emitted nothing at sf0.001")
    val twinMissing = twin.join(streamed, keys, "left_anti").count()
    assert(twinMissing == 0, "closed session in the batch twin missing from streaming output")
    // and every streamed session must be a REAL merged session: check
    // against the un-cutoff batch computation (same function, batch frames)
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .filter(col("event_type").isin("view", "purchase"))
    val all = StreamingSessions.mergedSessionAggregates(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"))
      .select(
        col("user_id"),
        unix_micros(col("session.start")).as("s_start_us"),
        unix_micros(col("session.end")).as("s_end_us"),
        col("n_a").as("n_view"),
        col("n_b").as("n_purchase"),
        col("n_events"))
    val phantom = streamed.join(all, keys, "left_anti").count()
    assert(phantom == 0, "streaming emitted a merged session batch doesn't have")
  }
}
