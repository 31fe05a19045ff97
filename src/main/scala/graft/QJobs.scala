package graft
import org.apache.spark.sql.SparkSession

/** Run one SparkEntry query (after a discarded warm-up run) and print
  * EVERY job and stage with task counts and summed task time — the
  * full attribution view behind TaskProf's one-line totals.
  */
object QJobs {
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
    case class St(name: String, var n: Int = 0, var ms: Long = 0L,
        var inB: Long = 0L, var recs: Long = 0L)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val on = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        if (on.get) {
          stages.putIfAbsent(ss.stageInfo.stageId, St(ss.stageInfo.name))
          order.add(ss.stageInfo.stageId)
        }
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (on.get) {
          val st = stages.get(te.stageId)
          val m = te.taskMetrics
          if (st != null && m != null) st.synchronized {
            st.n += 1; st.ms += m.executorRunTime
            st.inB += m.inputMetrics.bytesRead; st.recs += m.inputMetrics.recordsRead
          }
        }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.core.Caches.withScope {
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    }
    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    on.set(true)
    val t0 = System.nanoTime()
    val n = graft.core.Caches.withScope {
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    }
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
    on.set(false)
    import scala.jdk.CollectionConverters._
    val seen = scala.collection.mutable.LinkedHashSet[Int]()
    order.asScala.foreach(seen.add)
    println(f"[qjobs] $name wall=$wall%.2f s stages=${seen.size} rows=$n")
    seen.foreach { id =>
      val st = stages.get(id)
      if (st != null)
        println(f"[st] $id%4d tasks=${st.n}%4d sum=${st.ms / 1e3}%7.2f s " +
          f"in=${st.inB / 1e6}%6.1f MB recs=${st.recs}%8d  ${st.name.take(90)}")
    }
    spark.stop()
  }
}
