package graft

import graft.streaming.StreamingEnrich
import org.apache.spark.sql.functions._

/** Stream-static join parity: the continuous J1-dimension-enrich +
  * windowed count must agree with the identical batch plan on every
  * window it emits; append mode withholds only the watermark tail
  * (CLAUDE.md round-2 rule: mirror the cutoff, max_ts − watermark).
  */
class StreamingEnrichSpec extends SparkSpec {

  test("stream-static enrichment agrees with the batch windowed counts") {
    val dir = sf("sf0.001")
    val events = graft.core.Tables.events(spark, dir)
    val dim = graft.pipeline.Pipeline.itemCategory(
      events.select(
        get_json_object(col("props"), "$.k").cast("long").as("item_id")))

    val streamed = StreamingEnrich
      .runBounded(spark, s"$dir/events.parquet", dim, "stream_enrich_spec")
      .select(
        unix_timestamp(col("w.start")).as("w_start_s"),
        col("category_id"),
        col("n_events"))
      .cache()

    val batch = events
      .select(
        col("ts"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))
      .filter(col("item_id").isNotNull)
      .join(broadcast(dim), Seq("item_id"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("category_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_timestamp(col("w.start")).as("w_start_s"),
        col("category_id"),
        col("n_events"))
      .cache()

    val keys = Seq("w_start_s", "category_id", "n_events")
    assert(streamed.count() > 0)
    val matched = streamed.join(batch, keys, "left_semi").count()
    assert(matched == streamed.count(),
      "streaming emitted a window batch doesn't have")

    // anything batch-only must be in the unflushed tail: window end
    // (start + 1h) past max event time - 1h watermark
    val maxTs = events.agg(max(unix_timestamp(col("ts")))).collect().head.getLong(0)
    val missingEarly = batch
      .join(streamed, keys, "left_anti")
      .filter(col("w_start_s") + 3600L < maxTs - 3600L)
      .count()
    assert(missingEarly == 0, "non-tail window missing from streaming output")
  }
}
