package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** pHash separation probe: brute-force Hamming histogram over the
  * documents-as-media fixture plus banded pair counts at several
  * thresholds — checks the operator's two health conditions before it
  * enters the contract: (1) unrelated payloads sit near Hamming 32
  * (independent DCT signs — the hashed-4-gram grid working as
  * intended; a raw byte-frequency grid would collapse everything into
  * a near-clique), (2) the planted near-dups land under a small
  * threshold so the banded contract query is non-vacuous.
  *
  * Usage: tools/probe.sh graft.ProbePhash [sfDir]
  */
object ProbePhash {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val media = graft.multimodal.Multimodal.asMediaTable(docs, "doc_id", "text")
    val ph = graft.multimodal.Multimodal.perceptualHash64(media).cache()
    println("[ph] docs with hash: " + ph.count())
    Seq(3, 7).foreach { mh =>
      val pairs = graft.multimodal.Multimodal.phashNearDupPairs(media, mh, mh + 1)
      println(s"[ph] pairs at hamming<=$mh: " + pairs.count())
    }
    val a = ph.select(col("id").as("ia"), col("phash").as("pa"))
    val b = ph.select(col("id").as("ib"), col("phash").as("pb"))
    a.join(b, col("ia") < col("ib"))
      .select(bit_count(col("pa").bitwiseXOR(col("pb"))).as("h"))
      .groupBy((col("h") / 8).cast("int").as("octile")).count()
      .orderBy("octile").show()
    spark.stop()
  }
}
