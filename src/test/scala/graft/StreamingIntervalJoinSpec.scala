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
}
