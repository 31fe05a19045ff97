package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skewed-domain probe for the hot-bucket rank cohort (VERDICT r15
  * item 5): ProbeScaleLineitem ran UNIFORM value domains; this one
  * plants a Zipf-style head — ~50% of all rows carry ONE hot price
  * (so one level-1 bucket holds half the corpus) and the tail is made
  * near-unique (orderkey-derived cent offsets) — and re-times the
  * same q46/q99/q114/q69 cohort.
  *
  * What the design predicts (and the probe verifies): the level-2
  * exchange is SUPPORT-grain per (group, bucket) — a bucket of width
  * 2^shift can contribute at most 2^shift distinct-value rows to the
  * re-scan's window partition NO MATTER how many raw rows pile into
  * it (the hot value is ONE support row with a big count), so row
  * skew does not become exchange or window skew. The level-2 re-SCAN
  * reads the hot bucket's raw rows (~50% of the corpus) — that is
  * map-side, combinable, and scan-linear. StatsSpec pins the
  * bit-exactness of the ranks on a planted hot-bucket fixture.
  *
  * Usage: tools/probe.sh graft.ProbeSkewRanks <R> [srcSf] [outDir]
  */
object ProbeSkewRanks {
  def main(args: Array[String]): Unit = {
    val r = args.headOption.map(_.toInt).getOrElse(17)
    val src = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(2).headOption.getOrElse(s"/tmp/skew_li_x$r")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$src/lineitem.parquet")
    val keySpan = base.agg(max(col("l_orderkey"))).head().getLong(0) + 1L
    base
      .select(explode(sequence(lit(0L), lit(r - 1L))).as("__r"), col("*"))
      .select(
        (col("l_orderkey") + col("__r") * keySpan).as("l_orderkey") +:
          base.columns.filterNot(_ == "l_orderkey").map(col): _*)
      // Zipf head: half the rows land on ONE price (one hot level-1
      // bucket at any shift); the tail is near-unique in cents
      .withColumn("l_extendedprice",
        when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(2L)) === 0L,
          lit(50000.0))
          .otherwise(col("l_extendedprice") +
            pmod(col("l_orderkey") * 31L + col("l_linenumber"), lit(997L)) / 100.0))
      .transform(df => {
        graft.core.Sinks.writeScanParallelParquet(df, s"$out/lineitem.parquet")
        df
      })
    val n = spark.read.parquet(s"$out/lineitem.parquet").count()
    val hot = spark.read.parquet(s"$out/lineitem.parquet")
      .filter(col("l_extendedprice") === 50000.0).count()
    println(f"[skew] lineitem x$r = $n rows, hot-value share ${hot * 100.0 / n}%.1f%% at $out")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val ti = te.taskInfo
        val d = if (ti != null && ti.finished) ti.duration else 0L
        var cur = maxTaskMs.get()
        while (d > cur && !maxTaskMs.compareAndSet(cur, d)) cur = maxTaskMs.get()
      }
    })
    val cohort = Seq(
      "q46_group_quantiles", "q99_winsorize", "q114_mad_outliers",
      "q69_exact_median")
      .filter(SparkEntry.queries.contains)
    graft.core.Caches.withScope {
      cohort.foreach { name =>
        org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
        val b0 = shuffleBytes.get
        maxTaskMs.set(0L)
        val t0 = System.nanoTime()
        val res = try Right(SparkEntry.queries(name)(spark, out).queryExecution.toRdd.count())
        catch { case e: Throwable => Left(e.toString.take(120)) }
        val t = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
        val mb = (shuffleBytes.get - b0) / 1e6
        val mt = maxTaskMs.get / 1e3
        res match {
          case Right(rows) =>
            println(f"[skew] $name%-24s $t%8.1f s ${mb}%8.1f MB maxTask=$mt%6.1f s $rows%10d rows")
          case Left(err) => println(f"[skew] $name%-24s $t%8.1f s FAILED: $err")
        }
      }
    }
    spark.stop()
  }
}
