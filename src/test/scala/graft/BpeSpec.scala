package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** BPE merge learning: greedy non-overlapping rewrite, lexicographic
  * tie-break, merged symbols participating in later rounds, and
  * partitioning-invariance of the whole loop.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merged symbol feeds later rounds; count ties break lexicographically") {
    // 'aaab' x3: r1 (a,a)=6 wins. Rewrite is greedy left-to-right:
    // a a a b -> aa a b (NOT aa aa-overlap). r2 ties (aa,a)=3 vs
    // (a,b)=3 -> (a,b) lexicographically first. r3 fuses the two
    // merged symbols: (aa,ab) -> 'aaab'.
    val docs = Seq("aaab aaab aaab").toDF("text")
    val got = graft.core.Caches.withScope {
      Bpe.learnMerges(docs, "text", rounds = 3)
        .select("round", "pair_a", "pair_b", "merged", "pair_count")
        .as[(Long, String, String, String, Long)].collect().sortBy(_._1).toSeq
    }
    assert(got == Seq(
      (1L, "a", "a", "aa", 6L),
      (2L, "a", "b", "ab", 3L),
      (3L, "aa", "ab", "aaab", 3L)))
  }

  test("greedy left-to-right merge: 'aaaa' collapses to two 'aa' symbols in one round") {
    // 4-char run has 3 overlapping (a,a) pairs but only 2 merge
    // greedily; round 2 must see exactly one (aa,aa) pair per word.
    val docs = Seq("aaaa aaaa").toDF("text")
    val got = graft.core.Caches.withScope {
      Bpe.learnMerges(docs, "text", rounds = 2)
        .select("round", "merged", "pair_count")
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    }
    assert(got == Seq((1L, "aa", 6L), (2L, "aaaa", 2L)))
  }

  test("bit-identical under repartitioning") {
    val docs = Seq(
      "the quick brown fox", "the slow brown dog",
      "brown the fox quick", "dog the the brown").toDF("text")
    def run(df: org.apache.spark.sql.DataFrame) = graft.core.Caches.withScope {
      Bpe.learnMerges(df, "text", rounds = 4).orderBy("round").collect().toSeq
    }
    assert(run(docs.repartition(7)) == run(docs.coalesce(1)))
  }
}
