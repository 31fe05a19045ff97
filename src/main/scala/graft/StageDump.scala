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
    // per-stage max task duration: the skew axis (a stage whose
    // max_task ≈ stage wall has one hot task — post-exchange skew if
    // the stage reads a shuffle, input-layout concentration if it
    // reads the source)
    val maxTask = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val nTasks = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val ti = te.taskInfo
        if (ti != null && ti.finished) {
          maxTask.merge(te.stageId, ti.duration, (a, b) => math.max(a, b))
          nTasks.merge(te.stageId, 1, (a, b) => a + b)
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val w = si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6
        val r = si.taskMetrics.shuffleReadMetrics.remoteBytesRead / 1e6 +
          si.taskMetrics.shuffleReadMetrics.localBytesRead / 1e6
        val mt = maxTask.getOrDefault(si.stageId, 0L) / 1e3
        val nt = nTasks.getOrDefault(si.stageId, 0)
        if (w > 1 || r > 1 || mt > 0.5)
          println(f"[stage] ${si.stageId}%4d w=${w}%9.1f MB r=${r}%9.1f MB " +
            f"tasks=$nt%4d maxTask=${mt}%6.2f s  " + si.name.take(80))
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
