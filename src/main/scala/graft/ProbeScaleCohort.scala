package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-probe for the round-8 statistics/graph cohort (q200–q243):
  * replicates sf0.1's events table R× (fresh user ids per replica, the
  * item catalog and date range fixed — more users on the same shop,
  * the realistic densification) and times each events-backed cohort
  * query against the scaled table. Catches the q193/q227 pathology
  * class (superlinear plan/iteration blowups) that only shows up past
  * the bench scale.
  *
  * Usage: tools/probe.sh graft.ProbeScaleCohort <R> [srcSf] [outDir]
  *   e.g. R=100 = 10M events, R=200 = 20M (sf0.1 = 100k events).
  */
object ProbeScaleCohort {
  def main(args: Array[String]): Unit = {
    val r = args.headOption.map(_.toInt).getOrElse(100)
    val src = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(2).headOption.getOrElse(s"/tmp/scale_x$r")
    val queryFilter = args.drop(3).headOption.getOrElse("")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.core.Tables.events(spark, src)
    val userSpan = base.agg(max(col("user_id"))).head().getLong(0) + 1L
    val idSpan = base.agg(max(col("event_id"))).head().getLong(0) + 1L
    base
      .select(explode(sequence(lit(0L), lit(r - 1L))).as("__r"), col("*"))
      .select(
        (col("event_id") + col("__r") * idSpan).as("event_id"),
        col("ts"),
        (col("user_id") + col("__r") * userSpan).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val n = spark.read.parquet(s"$out/events.parquet").count()
    println(s"[scale] events x$r = $n rows at $out")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val cohort = SparkEntry.queries.keys.toSeq.sorted
      .filter(k => k.matches("q2[0-4][0-9].*")) ++
      Seq("q291_weighted_negatives", "q292_f1_threshold",
        "q303_stream_wcounts", "q304_stream_attrib", "q305_stream_enrich",
        "q306_accuracy_at1", "q307_stream_merge_sessions",
        "q308_approx_distinct_audit",
        "q309_unattributed_purchases",
        "q310_attribution_ledger",
        "q311_rank_sketch") // events-backed late block + r12-r14 additions
    val skip = Set("q208_textrank", "q233_fk_orphans", "q234_pareto_revenue",
      "q235_rfm_segments", "q236_dup_cluster_stats", "q244_k_anonymity",
      "q245_l_diversity", "q247_flesch", "q248_oov_rate", "q249_good_turing",
      "q250_distinct_n", "q251_source_overlap") // non-events tables
    // the q308 audit's bounded swap: same audit over a deterministic
    // 1/16 md5 value subset — the exact side's distinct exchange
    // shrinks by the mod while the error contract is unchanged
    def sampledAudit(): Unit = {
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      val b0 = shuffleBytes.get
      val t0 = System.nanoTime()
      val n = graft.ops.Profile.approxDistinctAudit(
          graft.core.Tables.events(spark, out)
            .select(col("event_id"), col("user_id"), col("event_type")),
          Seq("event_id", "user_id", "event_type"), sampleMod = 16)
        .queryExecution.toRdd.count()
      val t = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      val mb = (shuffleBytes.get - b0) / 1e6
      println(f"[scale] q308_sampled_mod16           $t%8.1f s ${mb}%8.1f MB $n%10d rows")
    }
    graft.core.Caches.withScope {
      cohort.filterNot(skip).filter(_.contains(queryFilter)).foreach { name =>
        org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
        val b0 = shuffleBytes.get
        val t0 = System.nanoTime()
        // toRdd.count: full-plan evaluation (df.count() prunes — see Bench)
        val res = try Right(SparkEntry.queries(name)(spark, out).queryExecution.toRdd.count())
        catch { case e: Throwable => Left(e.toString.take(120)) }
        val t = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
        val mb = (shuffleBytes.get - b0) / 1e6
        res match {
          case Right(rows) => println(f"[scale] $name%-28s $t%8.1f s ${mb}%8.1f MB $rows%10d rows")
          case Left(err) => println(f"[scale] $name%-28s $t%8.1f s FAILED: $err")
        }
        if (name == "q308_approx_distinct_audit") sampledAudit()
      }
    }
    spark.stop()
  }
}
