package graft

import graft.functions.Chunking
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks for context-window chunking and greedy packing over
  * generated data (fixed seeds, deterministic).
  */
class ChunkPackPropertySpec extends SparkSpec {
  import spark.implicits._

  private val docsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 10000L)
      nTok <- Gen.choose(1, 40)
      toks <- Gen.listOfN(nTok, Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(5)))
    } yield (id, toks.mkString(" ")))
  } yield rows.distinctBy(_._1)

  test("chunkDocs: chunks concatenate back to the doc, sizes bounded by window") {
    (1 to 8).foreach { i =>
      val docs = docsGen(Gen.Parameters.default, Seed(i.toLong)).get
      val df = docs.toDF("doc_id", "text")
      val chunks = Chunking.chunkDocs(df, "text", "doc_id", chunkTokens = 7)
        .select("doc_id", "chunk_idx", "chunk_text", "n_tokens")
        .as[(Long, Long, String, Long)].collect()

      val byDoc = chunks.groupBy(_._1)
      docs.foreach { case (id, text) =>
        val cs = byDoc(id).sortBy(_._2)
        // lossless cover in order
        assert(cs.map(_._3).mkString(" ") == text.trim.split("\\s+").mkString(" "),
          s"seed $i doc $id: chunks don't reassemble")
        // every chunk except the last is exactly the window; all > 0
        assert(cs.dropRight(1).forall(_._4 == 7L), s"seed $i doc $id: interior chunk size")
        assert(cs.forall(c => c._4 >= 1L && c._4 <= 7L))
        // declared sizes are true token counts
        assert(cs.forall(c => c._3.split("\\s+").length.toLong == c._4))
      }
    }
  }

  test("packGreedy: bins contiguous per shard, no bin starts before previous fills") {
    (1 to 8).foreach { i =>
      val docs = docsGen(Gen.Parameters.default, Seed(100 + i.toLong)).get
      val df = docs.toDF("doc_id", "text").select(
        col("doc_id"),
        pmod(col("doc_id"), lit(3L)).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("w"))
      val packed = Chunking.packGreedy(df, "shard", "doc_id", col("w"), capacity = 20L)
        .select("shard", "doc_id", "w", "bin_idx")
        .as[(Long, Long, Long, Long)].collect()

      packed.groupBy(_._1).foreach { case (shard, rows) =>
        val ordered = rows.sortBy(_._2)
        // bin ids non-decreasing in doc order
        assert(ordered.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
        // replay the running-sum rule exactly
        var cum = 0L
        ordered.foreach { case (_, id, w, bin) =>
          assert(bin == cum / 20L, s"seed $i shard $shard doc $id: bin $bin != ${cum / 20L}")
          cum += w
        }
      }
    }
  }
}
