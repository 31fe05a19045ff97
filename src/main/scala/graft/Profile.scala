package graft

import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiler for the candidate/feature pipeline: times each
  * subtree action separately so bench regressions can be localized.
  * `runMain graft.Profile [sfDir]`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val enriched = Pipeline.enrichedEvents(spark, sfDir)
    t("enriched (cache+count)")(enriched.count())
    val a = Pipeline.anchors(enriched).cache()
    t("anchors")(a.count())
    val prefixC = t("prefix candidates") {
      val p = Pipeline.prefixCandidates(a, enriched).cache(); p.count(); p
    }
    t("covis candidates")(
      Pipeline.covisCandidatesFromPrefix(prefixC, enriched, 2, 10).count())
    t("popularity candidates")(Pipeline.popularityCandidates(a, enriched, 5).count())
    t("user history candidates")(Pipeline.userHistoryCandidates(a, enriched, 10).count())
    t("candidates union+distinct")(Pipeline.candidatesFrom(a, enriched).count())
    t("features full")(Pipeline.features(spark, sfDir).count())
    spark.stop()
  }
}
