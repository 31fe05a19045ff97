package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q134 winnowing cost decomposition (run via tools/probe.sh on an idle
  * box). Findings that motivated the native WinnowedFps kernel:
  * shingling 0.9 s, +md5 hashes 0.9 s, +window-min fp sets 1.5 s — but
  * exploding the COMPOSED-HOF fp expression took 17.8 s vs 1.3 s over a
  * materialized attribute (the CodegenFallback generator-input
  * re-evaluation trap), putting full q134 at 19 s. With the one-pass
  * codegen kernel: 4.6 s.
  */
object ProbeWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm-up
    val docs = graft.core.Tables.documents(spark, sfDir)
    import graft.functions.TextFunctions.wordShingles

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }

    // composed-HOF formulation (the pre-kernel shape)
    val hashed = docs.select(
      col("doc_id").as("id"),
      transform(wordShingles(col("text"), 3), s =>
        conv(substring(md5(s), 1, 15), 16, 10).cast("long")).as("hs"))
    val sel = transform(
      sequence(lit(0), size(col("hs")) - 4),
      i => array_min(slice(col("hs"), i + 1, lit(4))))
    val hofFpsets = hashed
      .filter(size(col("hs")) >= 4)
      .select(col("id"), array_distinct(sel).as("fps"))

    time("hof_fp_sets") {
      hofFpsets.select(sum(size(col("fps")))).head().getLong(0)
    }
    time("hof_explode") { // re-evaluates the subtree per output element
      hofFpsets.select(explode(col("fps")).as("fp"), col("id")).count()
    }
    val native = docs.select(
      col("doc_id").as("id"),
      org.apache.spark.sql.graft.WinnowedFps(wordShingles(col("text"), 3), 4).as("fps"))
    time("native_explode") {
      native.select(explode(col("fps")).as("fp"), col("id")).count()
    }
    time("full_q134") {
      SparkEntry.queries("q134_winnowing")(spark, sfDir).count()
    }
    spark.stop()
  }
}
