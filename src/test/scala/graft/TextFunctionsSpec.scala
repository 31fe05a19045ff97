package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokens / tokenCount: whitespace split of trimmed text") {
    val n = one("  the quick\tbrown\n fox ")
      .select(TextFunctions.tokenCount(col("text"))).as[Int].head()
    assert(n == 4)
  }

  test("substrCount: literal occurrences via length arithmetic") {
    val n = one("abcabcab")
      .select(TextFunctions.substrCount(col("text"), "abc")).as[Long].head()
    assert(n == 2L)
  }

  test("wordShingles: n-grams over tokens; short text yields none") {
    val sh = one("a b c d")
      .select(TextFunctions.wordShingles(col("text"), 3)).as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    val none = one("a b")
      .select(TextFunctions.wordShingles(col("text"), 3)).as[Seq[String]].head()
    assert(none.isEmpty)
  }

  test("langId: argmax with first-wins ties, fallback on zero") {
    val markers = Seq("en" -> Seq("the"), "xx" -> Seq("zork"))
    val out = Seq("the cat sat", "zork zork", "nothing here")
      .toDF("text")
      .select(TextFunctions.langId(col("text"), markers, "und"))
      .as[String].collect().toSeq
    assert(out == Seq("en", "xx", "und"))
  }

  test("punctCount / meanTokenLenMilli") {
    val (p, m) = one("ab, cd! ef")
      .select(
        TextFunctions.punctCount(col("text")),
        TextFunctions.meanTokenLenMilli(col("text")))
      .as[(Long, Long)].head()
    assert(p == 2L)
    // non-ws chars = 8, tokens = 3 -> floor(8000/3) = 2666
    assert(m == 2666L)
  }

  test("fingerprint: normalization collapses case and whitespace") {
    val fps = Seq("Hello  World", "hello world", "hello worlds")
      .toDF("text")
      .select(TextFunctions.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("fingerprint32: unsigned 32-bit value from hex prefix") {
    val v = one("x").select(TextFunctions.fingerprint32(col("text"))).as[Long].head()
    assert(v >= 0L && v <= 0xffffffffL)
  }

  test("repetition_stats: one-pass row-local stats equal the relational form") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"),      // 5 toks, 2 distinct, top bigram "a b" x2 ("b a" x2 too)
      (2L, "x"),              // 1 token -> no bigrams
      (3L, "   "),            // whitespace-only -> 1 empty token after trim-split
      (4L, "p q r p q r p q")) // top bigram "p q" x3
      .toDF("doc_id", "text")
    val out = docs.select(
      col("doc_id"),
      graft.functions.TextFunctions.repetitionStats(col("text"), 2).as("rs"))
      .select(col("doc_id"), col("rs.n_tokens"), col("rs.n_distinct_tokens"),
        col("rs.top_ngram_count"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == (5L, 2L, 2L))
    assert(out(2L) == (1L, 1L, 0L))
    assert(out(3L) == (1L, 1L, 0L))
    assert(out(4L) == (8L, 3L, 3L))
    // relational cross-check on doc 4
    val rel = docs.filter(col("doc_id") === 4)
      .select(explode(graft.functions.TextFunctions.wordShingles(col("text"), 2)).as("bg"))
      .groupBy("bg").count().agg(max("count")).as[Long].head()
    assert(rel == 3L)
  }

  test("url functions: host/path/param parse and registrable-domain reduction") {
    import graft.functions.UrlFunctions._
    val df = Seq((1L, "https://www.news-site.com/en/doc-1?ref=r1&page=2"))
      .toDF("id", "url")
    val r = df.select(
      urlHost(col("url")).as("h"), urlPath(col("url")).as("p"),
      urlQueryParam(col("url"), "ref").as("q"),
      registrableDomain(urlHost(col("url"))).as("d"))
      .as[(String, String, String, String)].head()
    assert(r == (("www.news-site.com", "/en/doc-1", "r1", "news-site.com")))
  }

  test("capPerDomain keeps at most k rows per domain, best-ranked first") {
    import graft.functions.UrlFunctions._
    val docs = (1L to 20L).map { i =>
      (i, s"https://sub.dom${i % 2}.com/x", i * 10)
    }.toDF("id", "url", "score")
    val kept = capPerDomain(docs, "url", col("score"), "id", k = 3)
    assert(kept.count() == 6L)
    val perDom = kept.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(perDom.values.forall(_ == 3L))
    // best score per domain survives with rn=1
    assert(kept.filter(col("rn") === 1 && col("domain") === "dom0.com")
      .select("id").as[Long].head() == 20L)
  }

  test("rakeKeyphrases: deg/freq scores and phrase sums match the hand computation") {
    val docs = Seq(
      (1L, "deep learning of deep learning methods"),
      (2L, "deep learning")).toDF("doc_id", "text")
    val out = graft.core.Caches.withScope {
      graft.functions.TextRanking
        .rakeKeyphrases(docs, "text", "doc_id", Seq("of"), maxPhraseLen = 4, k = 10)
        .collect().map(r => r.getAs[String]("phrase") ->
          (r.getAs[Long]("n_words"), r.getAs[Long]("n_occ"), r.getAs[Long]("score_micro"))).toMap
    }
    // words: deep freq 3 deg 2+3+2=7 -> 2333333; learning same; methods freq 1 deg 3 -> 3000000
    assert(out("deep learning methods") == ((3L, 1L, 2333333L + 2333333L + 3000000L)))
    assert(out("deep learning") == ((2L, 2L, 2333333L * 2)))
    assert(out.size == 2)
  }

  test("rakeKeyphrases: non-alphabetic tokens break phrases and never join them") {
    val docs = Seq((1L, "neural nets, rock")).toDF("doc_id", "text")
    val out = graft.core.Caches.withScope {
      graft.functions.TextRanking
        .rakeKeyphrases(docs, "text", "doc_id", Seq("the"), maxPhraseLen = 4, k = 10)
        .collect().map(_.getAs[String]("phrase")).toSet
    }
    assert(out == Set("neural", "rock"), s"got $out")
  }

  test("rakeKeyphrases: phrases over maxPhraseLen are dropped entirely") {
    val docs = Seq((1L, "one two three four five and six")).toDF("doc_id", "text")
    val out = graft.core.Caches.withScope {
      graft.functions.TextRanking
        .rakeKeyphrases(docs, "text", "doc_id", Seq("and"), maxPhraseLen = 4, k = 10)
        .collect().map(_.getAs[String]("phrase")).toSet
    }
    assert(out == Set("six"), s"the 5-word run must vanish, got $out")
  }
}
