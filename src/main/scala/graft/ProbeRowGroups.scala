package graft

import org.apache.spark.sql.SparkSession

/** Scan-parallelism probe for the per-row kernel cohort (r13 finding /
  * r13-verdict item 5): every sf* fixture is ONE parquet file with ONE
  * row group, and row groups are atomic to readers — so every
  * scan-rate kernel pipeline (CDC chunking, substring fingerprints,
  * readability, bootstrap) runs single-task locally REGARDLESS of
  * `maxPartitionBytes`, and `max_task_frac ≈ 1` on those queries is
  * input layout, not plan skew. This probe rewrites the heavy tables
  * with bounded row groups ([[graft.core.Sinks.writeScanParallelParquet]]),
  * symlinks the rest, and times the cohort on both layouts. Expected:
  * identical plan fingerprints (paths are normalized out), wall drops
  * roughly by the core multiple, max_task_frac < 0.5.
  *
  * Usage: tools/probe.sh graft.ProbeRowGroups [srcSf] [outDir]
  */
object ProbeRowGroups {
  private val RewriteTables = Seq("documents", "lineitem", "events", "orders")
  private val LinkTables =
    Seq("region", "nation", "customer", "supplier", "part", "embeddings")
  // scan-rate kernel cohort: the r13 bench rows where max_task_frac was
  // blind because the scan cannot split (documents kernels, lineitem
  // single-pass stats)
  private val Cohort = Seq(
    "q01_pricing_summary", "q187_cdc_chunks", "q128_substring_repeats",
    "q179_short_repeats", "q102_dup_spans", "q134_winnowing",
    "q133_containment", "q247_flesch", "q59_repetition",
    "q121_bootstrap_ci", "q101_correlation", "q79_cube",
    "q88_grouping_sets", "q72_rollup", "q69_exact_median")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(1).headOption.getOrElse("/tmp/rg_" + new java.io.File(src).getName)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // make splits follow row groups: small cap so a multi-group file
      // fans out even at sf0.1 sizes (the sf* tables are 1-30 MB)
      .config("spark.sql.files.maxPartitionBytes", (2L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val outDir = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(outDir)
    RewriteTables.foreach { t =>
      // coalesce(1): keep ONE file so the measured difference is purely
      // row-group count, not file count
      graft.core.Sinks.writeScanParallelParquet(
        spark.read.parquet(s"$src/$t.parquet").coalesce(1),
        s"$out/$t.parquet",
        rowGroupBytes = 1L * 1024 * 1024)
      println(s"[rg] rewrote $t")
    }
    LinkTables.foreach { t =>
      val link = outDir.resolve(s"$t.parquet")
      if (!java.nio.file.Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
        java.nio.file.Files.createSymbolicLink(
          link, java.nio.file.Paths.get(s"$src/$t.parquet"))
    }

    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val ti = te.taskInfo
        val d = if (ti != null && ti.finished) ti.duration else 0L
        var cur = maxTaskMs.get()
        while (d > cur && !maxTaskMs.compareAndSet(cur, d)) cur = maxTaskMs.get()
      }
    })

    def run(dir: String, label: String): Unit = {
      println(s"[rg] === $label ($dir)")
      graft.core.Caches.withScope {
        Cohort.foreach { name =>
          org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
          maxTaskMs.set(0L)
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(name)(spark, dir)
          df.queryExecution.toRdd.count()
          val t = (System.nanoTime() - t0) / 1e9
          org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
          val frac = if (t > 0) maxTaskMs.get / 1e3 / t else 0.0
          val fp = Bench.planFingerprint(df)
          println(f"[rg] $name%-26s $t%7.2f s  max_task_frac ${frac}%4.2f  $fp")
        }
      }
    }
    // warm-up (JIT/codegen): one cheap pass over both layouts
    Seq(src, out).foreach(d => spark.read.parquet(s"$d/lineitem.parquet").count())
    run(src, "baseline 1-row-group")
    run(out, "bounded row groups")
    spark.stop()
  }
}
