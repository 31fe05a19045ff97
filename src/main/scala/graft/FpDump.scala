package graft
import org.apache.spark.sql.SparkSession

/** Print one query's NORMALIZED initial-plan string — the exact text
  * [[Bench.planFingerprint]] hashes — so a fingerprint drift between
  * two bench runs can be diffed down to the unstable substring.
  * Usage: tools/probe.sh graft.FpDump <name> [sfDir]
  */
object FpDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.count()
    println(Bench.normalizedPlan(df))
    println(s"[fp] $name ${Bench.planFingerprint(df)}")
    spark.stop()
  }
}
