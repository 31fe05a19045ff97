package graft
import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query: `runMain graft.QTime <name> [sfDir]`. */
object QTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm-up
    val t0 = System.nanoTime()
    // toRdd.count: full-plan evaluation — df.count() lets the optimizer
    // prune outer-join sides / agg values the count doesn't need
    val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    println(f"[qtime] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    spark.stop()
  }
}
