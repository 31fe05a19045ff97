package graft

import graft.pipeline.RetailRocket
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end comparison against BASELINE.md: generates a
  * RetailRocket-SHAPED synthetic dataset (same scale as the reference's
  * run of record — ~1.9M windowed events, ~230 K items, ~420 K
  * item-property rows, power-law users, May–Aug 2015) and times the
  * full pipeline (STEPs 2–8 incl. Word2Vec + embedding attach + parquet
  * write). The reference's notebook records 444 s wall on local[*];
  * this prints the comparable number for our engine on the same box.
  *
  * `runMain graft.BaselineBench [nEvents] [outDir]`
  */
object BaselineBench {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(1900000L)
    val outDir = args.drop(1).headOption.getOrElse("/tmp/rr-baseline")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[baseline] $name%-22s $s%8.1f s")
      (r, s)
    }

    // ---- deterministic synthetic RetailRocket-shape data ----
    val nUsers = 500000L
    val nItems = 230000L
    val nCats = 1000L
    val winStartMs = 1430438400000L // 2015-05-01
    val winMs = 92L * 86400 * 1000 // through 2015-08-01

    val (_, genS) = t("generate csv") {
      val ev = spark.range(nEvents)
        .select(
          (lit(winStartMs) + (pow(rand(1), 1.15) * winMs).cast("long")).as("timestamp"),
          (pow(rand(2), 2.0) * nUsers).cast("long").as("visitorid"),
          when(rand(3) < 0.941, "view")
            .when(rand(3) < 0.965, "addtocart")
            .otherwise("transaction").as("event"),
          (pow(rand(4), 3.0) * nItems).cast("long").as("itemid"),
          lit(null).cast("long").as("transactionid"))
      ev.coalesce(8).write.mode("overwrite").option("header", "true")
        .csv(s"$outDir/events_csv")

      // ~420K items carry categoryid (plus superseded snapshots and
      // non-category properties, exercising latest-wins + filtering)
      val props = spark.range(nItems * 2)
        .select(
          (lit(winStartMs) - 86400000L + (col("id") % 7) * 3600000L).as("timestamp"),
          (col("id") % nItems).as("itemid"),
          when(col("id") < nItems, "categoryid").otherwise("available").as("property"),
          when(col("id") < nItems,
            pmod(col("id") * 2654435761L, lit(nCats)).cast("string"))
            .otherwise("1").as("value"))
      props.coalesce(4).write.mode("overwrite").option("header", "true")
        .csv(s"$outDir/props_csv")
    }

    val (counts, pipelineS) = t("pipeline end-to-end") {
      RetailRocket.run(
        spark,
        s"$outDir/events_csv",
        Seq(s"$outDir/props_csv"),
        s"$outDir/processed")
    }

    println(
      s"""{"metric":"baseline_e2e","value":$pipelineS,"unit":"sec","gen_sec":$genS,""" +
        s""""events":$nEvents,"counts":{${counts.map { case (k, v) => s""""$k":$v""" }.mkString(",")}},""" +
        s""""reference_sec":444.13}""")
    spark.stop()
  }
}
