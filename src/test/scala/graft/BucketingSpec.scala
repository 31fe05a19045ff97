package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketing experiment (SURVEY.md §7 step 8): co-located storage
  * kills the exchange on the session-key joins. At 100 TB the events
  * table would be written bucketed by its join key once, and every
  * prefix/covis join afterwards is exchange-free on the big side.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without an exchange on the bucketed side") {
    val warehouse = Files.createTempDirectory("graft-warehouse").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bucketing LOCATION '$warehouse'")
    try {
      val events = graft.pipeline.Pipeline
        .sessionizedEvents(spark, sf("sf0.001"))
        .select("session_id", "epoch_s", "item_id", "event_id")
      events.write
        .mode("overwrite")
        .bucketBy(8, "session_id")
        .sortBy("session_id")
        .saveAsTable("graft_bucketing.events_bucketed")

      val t = spark.table("graft_bucketing.events_bucketed")
      val anchors = t.filter(col("event_id") % 10 === 0)
        .select(col("session_id"), col("epoch_s").as("anchor_s"))
      val joined = t.join(anchors, Seq("session_id"))
        .filter(col("epoch_s") < col("anchor_s"))

      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 0,
        s"bucketed self-join should shuffle neither side, found $exchanges exchanges:\n$plan")
      assert(joined.count() > 0)

      // sanity: same join on the unbucketed data needs exchanges
      val flat = events
      val flatJoined = flat.join(
        flat.filter(col("event_id") % 10 === 0)
          .select(col("session_id"), col("epoch_s").as("anchor_s")),
        Seq("session_id"))
      val flatPlan = flatJoined.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(flatPlan).nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucketing.events_bucketed")
      spark.sql("DROP DATABASE IF EXISTS graft_bucketing")
    }
  }
}
