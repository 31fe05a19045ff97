package graft
import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one SparkEntry query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    // full formatted explain (tree + per-node details) — the plans/rNN
    // before/after artifacts are captured with this; pass "tree" as a
    // 3rd arg for the tree-only view
    val full = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    if (args.length > 2 && args(2) == "tree")
      println(full.linesIterator.takeWhile(_ != "").mkString("\n"))
    else println(full)
    spark.stop()
  }
}
