package graft

import graft.core.Tables
import graft.ops.Joins
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the custom band join (DESIGN.md evidence, not part
  * of the contract surface): times the q152 gap histogram through (a)
  * the range-partitioned sweep-merge BandJoinExec and (b) Catalyst's
  * built-in plan for the same BETWEEN predicate (broadcast nested
  * loop), with an optional event-multiplier to push past the regime
  * where O(|L|·|R|) comparisons stop being fundable.
  *
  * `tools/probe.sh graft.ProbeBandJoin <sfDir> <mult>`
  */
object ProbeBandJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e0 = Tables.events(spark, sfDir).select(
      col("event_type"), unix_timestamp(col("ts")).as("epoch_s"))
    // multiplier: shift each copy by a coprime stride so copies don't
    // stack on identical timestamps (density stays realistic)
    val e =
      if (mult <= 1) e0
      else
        spark.range(mult).crossJoin(e0)
          .select(col("event_type"), (col("epoch_s") + col("id") * 7919L).as("epoch_s"))
    val p = e.filter(col("event_type") === "purchase").select(col("epoch_s").as("p_s"))
    val v = e.filter(col("event_type") === "view").select(col("epoch_s").as("v_s"))
    p.cache().count(); v.cache().count()

    def agg(pairs: DataFrame): DataFrame = pairs
      .select((col("v_s") - col("p_s")).as("gap"))
      .groupBy(expr("(gap + 30) div 10").as("gap_bin"))
      .agg(count(lit(1)).as("n_pairs"))

    def time(label: String)(f: => Array[org.apache.spark.sql.Row]): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-12s $sec%8.2f s  rows=${r.map(_.getLong(1)).sum}")
    }

    time("band-exec")(agg(Joins.bandJoin(p, v, "p_s", "v_s", 30L)).collect())
    time("builtin")(agg(p.join(v, col("v_s").between(col("p_s") - 30, col("p_s") + 30)))
      .collect())
    time("band-exec2")(agg(Joins.bandJoin(p, v, "p_s", "v_s", 30L)).collect())
    spark.stop()
  }
}
