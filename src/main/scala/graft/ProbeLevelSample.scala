package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost split for the level-sample sketch scan side at scale: the
  * md5-hex→substring→conv chain vs the typed-Aggregator path.
  * Usage: tools/probe.sh graft.ProbeLevelSample [dir]
  */
object ProbeLevelSample {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/scale_x100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.core.Tables.events(spark, src)
      .select(col("event_id"), round(col("value") * 100).cast("long").as("cents"))
      .localCheckpoint(true)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[ls] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.1f s  ($n)")
    }
    time("baseline scan (sum cents)") {
      ev.agg(sum(col("cents"))).queryExecution.toRdd.count()
    }
    time("md5 chain only (max h60)") {
      ev.agg(max(graft.ops.LevelSample.h60(col("event_id"))))
        .queryExecution.toRdd.count()
    }
    time("full sketch k=1024") {
      graft.ops.LevelSample.sketchPerGroup(ev, Nil, "event_id", "cents", 1024)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
