package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeTruss {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val enriched = graft.pipeline.Pipeline.enrichedEvents(spark, sfDir)
    val pairs = graft.ops.Joins.covisitationPairs(
      enriched.select(col("session_id"), col("item_id")),
      "session_id", "item_id", minCount = 1L)
    val t0 = System.nanoTime()
    val ne = pairs.count()
    println(f"[probe] covis edges: $ne (${(System.nanoTime()-t0)/1e9}%.1f s)")
    val deg = pairs.select(explode(array(col("item_a"), col("item_b"))).as("id"))
      .groupBy("id").count()
    println("[probe] top degrees:")
    deg.orderBy(desc("count")).limit(5).collect().foreach(r => println("  " + r))
    val sum2 = deg.agg(sum(col("count") * col("count"))).head().getLong(0)
    println(s"[probe] sum deg^2 = $sum2")
    val e = pairs.select(col("item_a").as("a"), col("item_b").as("b")).cache()
    val t1 = System.nanoTime()
    val tri = e.as("ab").join(e.as("bc"), col("ab.b") === col("bc.a"))
      .join(e.as("ac"), col("ac.a") === col("ab.a") && col("ac.b") === col("bc.b"))
      .select(col("ab.a").as("a"), col("ab.b").as("b"), col("bc.b").as("c"))
    val nt = tri.count()
    println(f"[probe] triangles: $nt (${(System.nanoTime()-t1)/1e9}%.1f s)")
    for (r <- 1 to 3) {
      val tr = System.nanoTime()
      val n = graft.core.Caches.withScope {
        graft.ops.Graph.kTrussEdges(pairs, "item_a", "item_b", k = 4, rounds = r).count()
      }
      println(f"[probe] kTruss rounds=$r: $n edges (${(System.nanoTime()-tr)/1e9}%.1f s)")
    }
    spark.stop()
  }
}
