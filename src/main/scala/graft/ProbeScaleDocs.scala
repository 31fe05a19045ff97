package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-probe for the documents-backed curation ops: replicates
  * sf0.1's documents table R× with fresh doc_ids and a per-replica
  * marker token appended to the text (so shingle/token sets differ
  * slightly across replicas — exact copies would make every dedup-ish
  * candidate structure degenerate in a way no real corpus is).
  * Catches per-round full-pass blowups (q268's iterative anti-joins)
  * and postings-join amplification that the 5k-doc bench scale cannot.
  *
  * Usage: tools/probe.sh graft.ProbeScaleDocs <R> [srcSf] [outDir] [queryFilter]
  *   e.g. R=100 = 500k docs (sf0.1 = 5k docs). Reuses outDir if it
  *   already holds the replica parquet.
  */
object ProbeScaleDocs {
  def main(args: Array[String]): Unit = {
    val r = args.headOption.map(_.toInt).getOrElse(100)
    val src = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(2).headOption.getOrElse(s"/tmp/scale_docs_x$r")
    val queryFilter = args.drop(3).headOption.getOrElse("")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(s"$out/documents.parquet/_SUCCESS").exists()) {
      val base = graft.core.Tables.documents(spark, src)
      val idSpan = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
      base
        .select(explode(sequence(lit(0L), lit(r - 1L))).as("__r"), col("*"))
        .select(
          (col("doc_id") + col("__r") * idSpan).as("doc_id"),
          concat(col("text"), lit(" zrep"), col("__r")).as("text"),
          col("lang"), col("source"),
          (col("n_chars") + length(concat(lit(" zrep"), col("__r"))))
            .as("n_chars"))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }
    val n = spark.read.parquet(s"$out/documents.parquet").count()
    println(s"[scale] documents x$r = $n rows at $out")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val cohort = Seq(
      "q267_token_allocation", "q268_coverage_select", "q272_rare_token_docs",
      "q275_curriculum", "q247_flesch", "q248_oov_rate", "q249_good_turing",
      "q250_distinct_n", "q251_source_overlap",
      // round-9 continuation block (doc-backed; q282 runs its contract
      // df cap here — replicas push shared-frame df to ~2R so the join
      // stage empties; ProbeFrameDedup holds occupancy for that stage)
      "q281_naive_bayes", "q282_frame_neardup", "q283_url_canonical",
      "q284_tokenizer_fertility", "q288_bpe_compression", "q290_dataset_card",
      "q312_phash_neardup") // r14: perceptual near-dup
    // q279's exact ground-truth side is support-sized BY DESIGN and
    // cannot run unsampled at corpus scale: the audit mode estimates
    // pairs completeness on a deterministic md5 doc sample. mod is
    // sized to hold the sampled-side doc count ~5k (the contract
    // scale) as the corpus grows.
    val sampleMod = math.max(1L, n / 5000L)
    val direct: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      (s"q279_blocking[mod=$sampleMod]", () =>
        graft.queries.CurationQueries.blockingQualityAudit(
          graft.core.Tables.documents(spark, out), sampleMod)),
      // q179's stride-1 position scan is corpus-char-rate by design;
      // the audit mode holds the sampled sub-corpus at the contract
      // volume as the corpus grows — expected: shuffle at (R, mod=R)
      // ~= the sf0.1 contract row's 33 MB, corpus-size-independent.
      (s"q179_repeats[mod=$sampleMod]", () =>
        graft.dedup.Dedup.maximalRepeatRangesAudit(
          graft.core.Tables.documents(spark, out), "text", "doc_id",
          minLen = 16, sampleMod = sampleMod)))
    val runnable =
      cohort.map(q => (q, () => SparkEntry.queries(q)(spark, out))) ++ direct
    runnable.filter(_._1.contains(queryFilter)).foreach { case (name, mk) =>
      graft.core.Caches.withScope {
        org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
        val b0 = shuffleBytes.get
        val t0 = System.nanoTime()
        val res = try Right(mk().count())
        catch { case e: Throwable => Left(e.toString.take(120)) }
        val t = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
        val mb = (shuffleBytes.get - b0) / 1e6
        res match {
          case Right(rows) =>
            println(f"[scale] $name%-28s $t%8.1f s ${mb}%8.1f MB $rows%10d rows")
          case Left(err) => println(f"[scale] $name%-28s $t%8.1f s FAILED: $err")
        }
      }
    }
    spark.stop()
  }
}
