package graft
import org.apache.spark.sql.SparkSession

/** Run one SparkEntry query and print wall + TOTAL task metrics (run
  * time, input bytes/records, shuffle) — the noise-robust instrument
  * for duplicate-subtree detection: a cache-race recompute doubles
  * input records / task time even when wall-clock noise hides it.
  */
object TaskProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    // 3rd arg "lazy": run the query with Caches.materialized degraded to
    // a lazy cache (constructionMode) — the per-site eager-vs-lazy A/B
    // instrument for the r16 eager-materialization sites. A broadcast
    // race under lazy shows up as inflated inRec/taskSum vs the eager
    // reading; equal readings mean the eager count is pure overhead.
    val lazyMode = args.length > 2 && args(2) == "lazy"
    def inMode[A](f: => A): A =
      if (lazyMode) graft.core.Caches.constructionMode(f) else f
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val inB = new java.util.concurrent.atomic.AtomicLong
    val inR = new java.util.concurrent.atomic.AtomicLong
    val shW = new java.util.concurrent.atomic.AtomicLong
    val nT = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          inB.addAndGet(m.inputMetrics.bytesRead)
          inR.addAndGet(m.inputMetrics.recordsRead)
          shW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          nT.incrementAndGet()
        }
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm-up
    // full warm-up run (fresh scope, discarded): JIT + codegen steady
    // state, so the measured run below reflects the plan, not the JVM
    inMode { graft.core.Caches.withScope {
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    } }
    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    runMs.set(0); inB.set(0); inR.set(0); shW.set(0); nT.set(0)
    val t0 = System.nanoTime()
    val n = inMode { graft.core.Caches.withScope {
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    } }
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    println(f"[taskprof] $name${if (lazyMode) "(lazy)" else ""} wall=$wall%.2f s taskSum=${runMs.get / 1e3}%.2f s " +
      f"tasks=${nT.get} inMB=${inB.get / 1e6}%.1f inRec=${inR.get} " +
      f"shufMB=${shW.get / 1e6}%.2f rows=$n")
    spark.stop()
  }
}
