package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the per-iteration overhead of [[graft.ops.Graph.pagerankMicro]]
  * independently of the event pipeline: synthetic ring+chord graph,
  * varying |V|, iteration count and the broadcast/shuffle rank regime.
  * `runMain graft.ProbeGraph [nNodes] [iters]`
  */
object ProbeGraph {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("real")) { realPipeline(args.drop(1).headOption
      .getOrElse("/root/testdata/sf0.1")); return }
    val n = args.headOption.map(_.toLong).getOrElse(1000L)
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val edges = spark.range(n).selectExpr(
      "id AS src", s"(id + 1) % $n AS dst", "1 + id % 7 AS w")
      .union(spark.range(n).selectExpr(s"id AS src", s"(id * 31 + 7) % $n AS dst", "1 AS w"))
    edges.cache().count()
    for (bc <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val out = graft.ops.Graph
        .pagerankMicro(edges.toDF(), "src", "dst", "w", iters, broadcastRanks = bc)
      val s = out.agg(sum("pr_micro")).head().getLong(0)
      println(f"[probe-graph] n=$n iters=$iters broadcast=$bc: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s (checksum $s)")
    }
    spark.stop()
  }

  /** Stage-by-stage timing of the real q87 path. */
  def realPipeline(d: String): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-graph] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val enriched = t("enrichedEvents count") {
      val e = graft.pipeline.Pipeline.enrichedEvents(spark, d); e.count(); e
    }
    val edges = t("transitionCounts count") {
      val tc = graft.ops.Windows.transitionCounts(
        enriched, "session_id",
        Seq(col("epoch_s").asc, col("event_id").asc), "item_id")
      tc.cache().count(); tc
    }
    t("pagerank on cached edges") {
      graft.ops.Graph.pagerankMicro(edges, "item_a", "item_b", "transition_count",
        3, broadcastRanks = true).agg(sum("pr_micro")).head()
    }
    t("full q87 from scratch (all caches warm)") {
      graft.queries.EventQueries.pagerank(spark, d).count()
    }
    spark.stop()
  }
}
