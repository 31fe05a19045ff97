package graft

import org.apache.spark.sql.SparkSession

/** Sequential mini-bench: run named contract queries in ONE
  * Caches.withScope session (the Bench cross-query cache-reuse
  * environment) and print per-query wall — for isolating cache
  * interaction effects. Usage:
  *   tools/probe.sh graft.ProbeSeq <dir> q1 q2 ...
  */
object ProbeSeq {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Caches.withScope {
      args.drop(1).foreach { q =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.count()
        println(f"[seq] $q%-28s ${(System.nanoTime() - t0) / 1e9}%6.1f s ($n)")
      }
    }
    spark.stop()
  }
}
