package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-matched probe for [[graft.multimodal.Multimodal
  * .frameNearDupPairs]]'s JOIN stage: on R×-replicated documents every
  * base-corpus shared frame reappears in ~2R docs, so the CONTRACT df
  * cap (20) filters everything and only the linear frame-extraction /
  * df-count stages get exercised (ProbeScaleDocs covers those). This
  * probe raises maxDf to ~3R so the replicated dup-cluster frames pass
  * the filter and the pair join carries its designed volume
  * (Σ df² per surviving fingerprint — the same bucket-quadratic regime
  * as the LSH ops, where the plane-count probe rule came from).
  *
  * Usage: tools/probe.sh graft.ProbeFrameDedup <R> [docsDir]
  *   docsDir defaults to ProbeScaleDocs' output for the same R (run
  *   that first to materialize the replicas).
  */
object ProbeFrameDedup {
  def main(args: Array[String]): Unit = {
    val r = args.headOption.map(_.toInt).getOrElse(100)
    val docsDir = args.drop(1).headOption.getOrElse(s"/tmp/scale_docs_x$r")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
      .withColumn("ascii_text", regexp_replace(col("text"), "[^ -~]", ""))
    val media = graft.multimodal.Multimodal.asMediaTable(docs, "doc_id", "ascii_text")
    val maxDf = 3 * r
    graft.core.Caches.withScope {
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      val t0 = System.nanoTime()
      val n = graft.multimodal.Multimodal
        .frameNearDupPairs(media, frameBytes = 32, maxDf = maxDf, k = 25)
        .count()
      val t = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      println(f"[scale] frameNearDup x$r maxDf=$maxDf $t%8.1f s ${shuffleBytes.get / 1e6}%8.1f MB $n%6d pairs")
    }
    spark.stop()
  }
}
