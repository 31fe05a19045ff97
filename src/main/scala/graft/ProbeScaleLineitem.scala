package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-probe for the lineitem order-statistics cohort (q46/q99/q114 —
  * the round-12 support-grain recasts, VERDICT r12 item 4): replicates
  * sf0.1's lineitem R× (fresh order keys per replica, the value domain
  * and group keys fixed — more rows over the same ~4-value returnflag
  * dimension, exactly the regime where the old per-row rank windows
  * collapsed to one hot task per group) and times each query against
  * the scaled table.
  *
  * Usage: tools/probe.sh graft.ProbeScaleLineitem <R> [srcSf] [outDir]
  *   e.g. R=17 = 10.2M rows (sf0.1 lineitem = 600k rows).
  */
object ProbeScaleLineitem {
  def main(args: Array[String]): Unit = {
    val r = args.headOption.map(_.toInt).getOrElse(17)
    val src = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(2).headOption.getOrElse(s"/tmp/scale_li_x$r")
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
      // bounded row groups (r14 rule): the single-partition explode
      // would otherwise land as one file with default 128 MB groups —
      // single-task for every scan, understating the cohort's map-side
      // parallelism at exactly the scale the probe exists to show
      .transform(df => {
        graft.core.Sinks.writeScanParallelParquet(df, s"$out/lineitem.parquet")
        df
      })
    val n = spark.read.parquet(s"$out/lineitem.parquet").count()
    println(s"[scale] lineitem x$r = $n rows at $out")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val cohort = Seq(
      "q46_group_quantiles", "q99_winsorize", "q114_mad_outliers",
      "q69_exact_median")
      .filter(SparkEntry.queries.contains)
    graft.core.Caches.withScope {
      cohort.foreach { name =>
        org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
        val b0 = shuffleBytes.get
        val t0 = System.nanoTime()
        val res = try Right(SparkEntry.queries(name)(spark, out).queryExecution.toRdd.count())
        catch { case e: Throwable => Left(e.toString.take(120)) }
        val t = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
        val mb = (shuffleBytes.get - b0) / 1e6
        res match {
          case Right(rows) => println(f"[scale] $name%-24s $t%8.1f s ${mb}%8.1f MB $rows%10d rows")
          case Left(err) => println(f"[scale] $name%-24s $t%8.1f s FAILED: $err")
        }
      }
    }
    spark.stop()
  }
}
