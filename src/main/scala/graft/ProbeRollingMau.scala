package graft

import org.apache.spark.sql.SparkSession

/** A/B probe: q240 exact rolling-30 MAU (fact-grain ×30 explode) vs
  * the HLL-partial swap (sketch-grain fan-out) — wall seconds, shuffle
  * MB, and max relative MAU error. `tools/probe.sh graft.ProbeRollingMau
  * [sfDir]`. Backs the DESIGN.md round-9 A/B table.
  */
object ProbeRollingMau {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.core.Tables.events(spark, sfDir).count()

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def timed(label: String)(body: => Array[org.apache.spark.sql.Row]): Array[org.apache.spark.sql.Row] = {
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      val b0 = shuffleBytes.get
      val t0 = System.nanoTime()
      val out = body
      val t = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      println(f"[probe] $label: $t%.2f s, ${(shuffleBytes.get - b0) / 1e6}%.1f MB shuffle, ${out.length} rows")
      out
    }
    import graft.queries.{EventQueries => EQ}
    val exact = timed("exact (x30 explode)")(EQ.dauMauStickiness(spark, sfDir).collect())
    val hll = timed("hll partials")(EQ.dauMauStickinessHll(spark, sfDir).collect())
    val exactMau = exact.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val errs = hll.flatMap { r =>
      exactMau.get(r.getLong(0)).map(e => math.abs(r.getLong(2) - e).toDouble / e)
    }
    println(f"[probe] max rel MAU error: ${errs.max}%.4f over ${errs.length} days")
    spark.stop()
  }
}
