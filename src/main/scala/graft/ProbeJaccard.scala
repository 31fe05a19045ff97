package graft

import graft.core.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the near-dup pair paths (DESIGN.md evidence, not
  * part of the contract surface): replicates the documents table
  * `mult`× with perturbed tails (near-identical copies — the
  * boilerplate-heavy regime), then times postings-list brute force vs
  * prefix-filtered vs LSH-blocked pair generation at the same 0.5
  * threshold, with shuffle-write bytes per run.
  *
  * `runMain graft.ProbeJaccard <sfDir> <mult>` — probe via a classes
  * snapshot + `java -cp` on an idle machine (CLAUDE.md discipline).
  */
object ProbeJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.drop(1).headOption.map(_.toInt).getOrElse(10)
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

    val mode = args.drop(2).headOption.getOrElse("dense")
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // dense: copies stay near-identical (tail marker only) — every doc
    // has mult−1 true near-dups. sparse: every 7th token is rewritten
    // per copy, breaking 4-gram windows — J(copy_i, copy_j) ≈ 0.1, so
    // the corpus is mult× bigger with the SAME near-dup pair count.
    // boiler: sparse variants PLUS a 30-token boilerplate header shared
    // by the whole corpus — the stop-shingle regime where every doc
    // shares ~27 4-grams with every other doc and postings-pair
    // enumeration goes O(corpus²).
    val boilerplate =
      (1 to 30).map(k => s"boiler$k").mkString("", " ", " ")
    def sparseVariant(i: Int) =
      array_join(
        transform(
          split(trim(col("text")), "\\s+"),
          (t, ix) => when(pmod(ix + lit(i), lit(7)) === 0, concat(t, lit(s"v$i"))).otherwise(t)),
        " ")
    def variant(i: Int) = mode match {
      case "dense"  => concat(col("text"), lit(s" probecopy$i"))
      case "sparse" => sparseVariant(i)
      case "boiler" => concat(lit(boilerplate), sparseVariant(i))
    }
    val docs = (0 until mult)
      .map(i => base.select((col("doc_id") * mult + i).as("doc_id"), variant(i).as("text")))
      .reduce(_ union _)
      .cache()
    println(s"[probe] docs: ${docs.count()} (${mult}x, $mode)")

    def timed(name: String)(f: => Long): Unit = {
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      val b0 = shuffleBytes.get
      val t0 = System.nanoTime()
      val n = f
      val t = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      val mb = (shuffleBytes.get - b0) / 1e6
      println(f"[probe] $name%-22s $t%8.2f s  $mb%8.1f MB shuffled  $n%9d pairs")
    }

    graft.core.Caches.withScope {
      timed("prefix-filter") {
        Dedup.jaccardPrefixFilterPairs(docs, "text", "doc_id", 4, 500000L).count()
      }
    }
    graft.core.Caches.withScope {
      timed("postings-bruteforce") {
        Dedup.ngramJaccardPairs(docs, "text", "doc_id", 4, 500000L).count()
      }
    }
    graft.core.Caches.withScope {
      // LSH path: minhash signatures -> banded candidates (recall < 1)
      timed("lsh-candidates") {
        Dedup
          .lshCandidatePairs(
            Dedup.lshBands(
              Dedup.minhashSignaturesInline(docs, "text", "doc_id", n = 4, numHashes = 8),
              bands = 4, rowsPerBand = 2),
            maxBucketSize = Some(1000))
          .count()
      }
    }
    spark.stop()
  }
}
