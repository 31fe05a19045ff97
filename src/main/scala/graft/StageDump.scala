package graft
import org.apache.spark.sql.SparkSession

/** Run one SparkEntry query and print per-stage shuffle-write volume —
  * the attribution tool behind DESIGN.md's shuffle narratives.
  */
object StageDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val w = si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6
        val r = si.taskMetrics.shuffleReadMetrics.remoteBytesRead / 1e6 +
          si.taskMetrics.shuffleReadMetrics.localBytesRead / 1e6
        if (w > 1 || r > 1)
          println(f"[stage] ${si.stageId}%4d w=${w}%9.1f MB r=${r}%9.1f MB  " +
            si.name.take(90))
      }
    })
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    // toRdd.count: full-plan evaluation (df.count() prunes — see Bench)
    val n = df.queryExecution.toRdd.count()
    Thread.sleep(2000)
    println(f"[stagedump] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    println(df.queryExecution.executedPlan.toString.linesIterator
      .take(60).mkString("\n"))
    spark.stop()
  }
}
