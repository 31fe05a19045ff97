package graft

import graft.ops.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe: id-oriented vs degree-oriented triangle counting
  * (DESIGN.md evidence). Two regimes: the REAL covis graph at a test
  * SF (flat-ish degrees) and a synthetic hub graph (one vertex wired
  * to everything — the id-oriented worst case when the hub's id is
  * low). `tools/probe.sh graft.ProbeTriangles [sfDir] [nHubSpokes]`
  */
object ProbeTriangles {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spokes = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val s = f.agg(sum("tri_count")).head().getLong(0)
      println(f"[probe-tri] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s (3x triangles=$s)")
    }

    // regime 1: real covis edges (q137's input)
    val enriched = graft.pipeline.Pipeline.enrichedEvents(spark, sfDir)
    val covis = graft.ops.Joins
      .covisitationPairsDistinct(
        enriched.select(col("session_id"), col("item_id")),
        "session_id", "item_id", minCount = 1L)
      .select(col("item_a").as("src"), col("item_b").as("dst"))
    covis.cache().count()
    graft.core.Caches.withScope { time("covis id-oriented")(
      Graph.triangleCounts(covis, "src", "dst")) }
    graft.core.Caches.withScope { time("covis degree-oriented")(
      Graph.triangleCountsDegreeOriented(covis, "src", "dst")) }

    // regime 2: hub graph — hub with a MID-RANGE id (in-degree ≈
    // out-degree ≈ spokes/2 under id orientation: the path-join
    // worst case, Σ indeg·outdeg ≈ spokes²/4 wedges through the hub),
    // plus a sparse ring among spokes so triangles exist
    val h = spokes.toLong / 2
    val hub = spark.range(0, spokes.toLong)
      .filter(col("id") =!= h)
      .selectExpr(s"least(id, $h) AS src", s"greatest(id, $h) AS dst")
    val ring = spark.range(0, spokes.toLong - 1)
      .filter(col("id") =!= h && col("id") + 1 =!= h)
      .selectExpr("id AS src", "id + 1 AS dst")
    val hubG = hub.union(ring).toDF("src", "dst")
    hubG.cache().count()
    graft.core.Caches.withScope { time("hub id-oriented")(
      Graph.triangleCounts(hubG, "src", "dst")) }
    graft.core.Caches.withScope { time("hub degree-oriented")(
      Graph.triangleCountsDegreeOriented(hubG, "src", "dst")) }
    spark.stop()
  }
}
