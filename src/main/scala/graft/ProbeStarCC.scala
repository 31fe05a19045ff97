package graft

import org.apache.spark.sql.SparkSession

/** Probe: star-CC round behavior on a planted deep chain (DESIGN.md
  * "web-scale connected components"). Prints per-round edge counts.
  */
object ProbeStarCC {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val chain = (0L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val t0 = System.nanoTime()
    val cc = graft.dedup.Dedup.connectedComponentsStar(chain)
    val bad = cc.filter(org.apache.spark.sql.functions.col("component") =!= 0L).count()
    println(s"[probe] n=$n nonzero=$bad rows=${cc.count()} t=${(System.nanoTime()-t0)/1e9}s")
    spark.stop()
  }
}
