package graft

import graft.dedup.Dedup
import graft.functions.TextRanking
import graft.ops.Joins
import org.apache.spark.sql.functions._

/** Round-5 additions: duplicated-span detection, held-out bigram
  * surprisal, MERGE/upsert.
  */
class SpanMergeSpec extends SparkSpec {
  import spark.implicits._

  test("duplicatedSpans: verbatim repeats are caught, unique text is not") {
    val shared = "X" * 64 // one full window, identical across two docs
    val docs = Seq(
      (1L, shared + " unique tail one " + "a" * 30),
      (2L, shared + " other ending entirely " + "b" * 24),
      (3L, "totally different content with no repeats whatever " + "c" * 20))
      .toDF("doc_id", "text")
    val out = Dedup
      .duplicatedSpans(docs, "text", "doc_id", spanLen = 64, stride = 32)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // docs 1 and 2 share the position-0 span; doc 3 has none duplicated
    assert(out(1L)._2 >= 1L && out(2L)._2 >= 1L)
    assert(out(3L)._2 == 0L)
    // span count = floor((len-64)/32)+1
    assert(out(3L)._1 == (docs.filter($"doc_id" === 3).head.getString(1).length - 64) / 32 + 1)
  }

  test("duplicatedSpans: within-doc repetition counts as duplication") {
    val doc = ("R" * 64) + ("R" * 64) // stride 32: four windows, all identical
    val out = Dedup
      .duplicatedSpans(Seq((7L, doc)).toDF("doc_id", "text"),
        "text", "doc_id", 64, 32)
      .collect().head
    assert(out.getLong(1) == 3L) // positions 0,32,64 (floor((128-64)/32)=2)
    assert(out.getLong(2) == 3L)
    assert(out.getLong(3) == 1000000L)
  }

  test("bigramSurprisal: Laplace-smoothed held-out scoring, exact micro") {
    val docs = Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
    val out = TextRanking.bigramSurprisal(docs, "text", "doc_id").collect()
    assert(out.length == 1)
    val r = out.head
    // train: c(a,b)=2, c(b,a)=1; heads a->2, b->1; V=2
    // s(a,b) = round(-ln(3/4)*1e6) = 287682
    // s(b,c) = round(-ln(1/3)*1e6) = 1098612 ; floor(mean) = 693147
    assert(r.getLong(0) == 1L)
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 693147L)
  }

  test("upsert: update wins, insert lands, unmatched base survives") {
    val base = Seq(
      (1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0))
      .toDF("k", "name", "bal")
    val updates = Seq((2L, 99.0), (4L, 40.0)).toDF("k", "bal")
    val out = Joins.upsert(base, updates, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, Some("alice"), 10.0),
      (2L, Some("bob"), 99.0), // updated bal, name kept
      (3L, Some("carol"), 30.0),
      (4L, None, 40.0))) // inserted; missing cols null
  }

  test("paragraphDedup: first occurrence wins, order preserved, empty-doc survival") {
    val docs = Seq(
      (1L, "shared intro\n\nunique one\n\nshared outro"),
      (2L, "shared intro\n\nunique two\n\nshared outro"),
      (3L, "shared intro")) // loses everything -> survives empty
      .toDF("doc_id", "text")
    val out = graft.ops.Lines.paragraphDedup(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 3L, 3L, "shared intro\n\nunique one\n\nshared outro")))
    assert(out(1) == ((2L, 3L, 1L, "unique two")))
    assert(out(2) == ((3L, 1L, 0L, "")))
  }

  test("upsert: composite keys and column subset") {
    val base = Seq((1L, "x", "v1", 1L), (1L, "y", "v2", 2L)).toDF("k1", "k2", "v", "extra")
    val updates = Seq((1L, "y", "V2NEW")).toDF("k1", "k2", "v")
    val out = Joins.upsert(base, updates, Seq("k1", "k2"))
      .orderBy("k2").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(("x", "v1", 1L), ("y", "V2NEW", 2L)))
  }

  test("upsert: latestBy dedupes duplicate update keys, latest wins, no row multiplication") {
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "bal")
    val updates = Seq((1L, 100.0, 1L), (1L, 111.0, 3L), (1L, 105.0, 2L), (2L, 222.0, 5L))
      .toDF("k", "bal", "ver")
    val out2 = Joins.upsert(base, updates, Seq("k"), latestBy = Some(col("ver")))
      .select("k", "bal").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out2.toSeq == Seq((1L, 111.0), (2L, 222.0)))
  }
}
