package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Read-side A/B for the flagship feature-matrix layout (VERDICT r14
  * item 8): the BaselineBench artifact (50k-record files, ≤8 MB row
  * groups via writeScanParallelParquet) vs the same rows as ONE file
  * with the default 128 MB row group — a scan-rate aggregate over both,
  * wall + task counts. `tools/probe.sh graft.ProbeMatrixReadback
  * [matrixDir]` (expects a prior BaselineBench run).
  */
object ProbeMatrixReadback {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/rr-baseline/processed/X_train_spark.parquet")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", s"${8L * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val mono = "/tmp/rr-baseline/processed/x_train_mono.parquet"
    spark.read.parquet(dir).coalesce(1).write.mode("overwrite").parquet(mono)

    val nTasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        nTasks.incrementAndGet()
    })
    // a CPU-heavy scan-rate aggregate (per-row kernel-ish arithmetic
    // over every embedding dim) — the training-consumer shape
    def scan(path: String, label: String): Unit = {
      val embSum = (0 until 16)
        .map(i => abs(col(s"cat_emb_$i")).cast("double"))
        .reduce(_ + _)
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      nTasks.set(0)
      val t0 = System.nanoTime()
      val r = spark.read.parquet(path)
        .select(sum(embSum * col("recency_sec")).as("s"), count(lit(1)).as("n"))
        .collect()(0)
      val t = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      println(f"[readback] $label: $t%.2f s, ${nTasks.get} tasks, n=${r.getLong(1)}")
    }
    // alternate to keep cache effects symmetric
    scan(mono, "mono-file warmup")
    scan(dir, "bounded warmup")
    scan(mono, "mono-file (1 file, default 128MB group)")
    scan(dir, "bounded (50k-rec files, 8MB groups)")
    spark.stop()
  }
}
