package graft

import graft.functions.{TextClassify, UrlFunctions}
import graft.multimodal.Multimodal
import graft.ops.Linkage
import org.apache.spark.sql.functions._

/** Invariants for the round-9 continuation block (q281–q288):
  * multinomial Naive Bayes confusion, frame-fingerprint media near-dup,
  * crawl-URL canonicalization, tokenizer fertility, Fellegi–Sunter
  * record linkage, FD-violation audit, modularity, BPE encoding.
  * Cross-engine value equality is the Verify/DuckDB gate; these pin
  * the semantic promises on handcrafted fixtures.
  */
class LinkageClassifySpec extends SparkSpec {
  import spark.implicits._

  test("nbConfusion: separable corpora classify onto the diagonal") {
    // two labels with disjoint vocabularies — NB must recover both
    val docs = Seq(
      (1L, "cat cat dog cat", "pets"),
      (2L, "dog cat dog", "pets"),
      (3L, "cat dog cat cat", "pets"),
      (4L, "bolt nut bolt wrench", "tools"),
      (5L, "wrench bolt nut nut", "tools")
    ).toDF("doc_id", "text", "label")
    val conf = TextClassify.nbConfusion(docs, "text", "doc_id", "label")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf == Map(("pets", "pets") -> 3L, ("tools", "tools") -> 2L))
  }

  test("nbConfusion: tie on identical evidence breaks to class name ASC") {
    // identical single-doc corpora per label: every doc scores equally
    // under both classes -> argmin tie -> first class name wins for all
    val docs = Seq(
      (1L, "x y", "b"),
      (2L, "x y", "a")
    ).toDF("doc_id", "text", "label")
    val conf = TextClassify.nbConfusion(docs, "text", "doc_id", "label")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf == Map(("a", "a") -> 1L, ("b", "a") -> 1L))
  }

  test("frameNearDupPairs: planted shared frames rank the true pair first") {
    // 32-byte frames; docs 1 and 2 share three frames exactly (96
    // aligned bytes), doc 3 shares nothing. Frame content is
    // NON-PERIODIC (round-6 fixture rule) so no accidental overlap.
    val block = (0 until 3).map(i => s"frame-$i-" + ("abcdefghij".take(7 - i) + "zqwkx").padTo(24, ('a' + i).toChar)).map(_.take(32).padTo(32, '.')).mkString
    assert(block.length == 96)
    val docs = Seq(
      (1L, block + "tail-one-unique-content-000000000"),
      (2L, block + "tail-two-different-suffix-1111111"),
      (3L, "completely unrelated payload with no shared aligned frames at all 12345")
    ).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val out = Multimodal.frameNearDupPairs(media, frameBytes = 32, maxDf = 10, k = 5).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Long]("shared_frames") == 3L)
    assert(r.getAs[Long]("overlap_ppm") == 1000000L) // all rare frames of each side shared
  }

  test("frameNearDupPairs: ubiquitous frames are excluded by the df cap") {
    // one frame shared by ALL four docs (df=4 > maxDf=3) must not pair anyone
    val common = "W" * 32
    val docs = Seq(
      (1L, common + "doc-one-suffix-abcdefghijklmnopq"),
      (2L, common + "doc-two-suffix-qponmlkjihgfedcba"),
      (3L, common + "doc-three-suffix-zyxwvutsrqponml"),
      (4L, common + "doc-four-suffix-mnbvcxzlkjhgfdsa")
    ).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val out = Multimodal.frameNearDupPairs(media, frameBytes = 32, maxDf = 3, k = 10).collect()
    assert(out.isEmpty)
  }

  test("canonicalizeUrl: variants collapse, distinct pages do not") {
    val cases = Seq(
      "https://WWW.Site.com/p/7/?utm_source=feed&id=2",
      "https://www.site.com/p/7?id=2&utm_campaign=x#frag",
      "HTTPS://site.COM/p/7/?id=2&gclid=abc",
      "https://site.com/p/7?id=2"
    ).toDF("url")
    val canon = cases.select(UrlFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(canon == Set("https://site.com/p/7?id=2"))
    // different page / different surviving param stay distinct
    val distinct = Seq(
      "https://site.com/p/7?id=2",
      "https://site.com/p/8?id=2",
      "https://site.com/p/7?id=3",
      "https://other.com/p/7?id=2"
    ).toDF("url")
    assert(
      distinct.select(UrlFunctions.canonicalizeUrl(col("url")).as("c"))
        .distinct().count() == 4L)
  }

  test("canonicalizeUrl: boundary anchoring — utm in PATH and suffix param names survive") {
    val out = Seq(
      "https://site.com/blog/utm_tips=ranking/page?id=1", // utm_ inside the PATH
      "https://site.com/p?id=1&xgclid=2",                 // suffix-matching param name
      "https://site.com/p?utm_a=1&utm_b=2&id=3",          // ADJACENT tracking params
      "site.com/a"                                        // schemeless: stays opaque
    ).toDF("url")
      .select(UrlFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(out(0) == "https://site.com/blog/utm_tips=ranking/page?id=1",
      s"path corrupted: ${out(0)}")
    assert(out(1) == "https://site.com/p?id=1&xgclid=2", s"suffix param eaten: ${out(1)}")
    assert(out(2) == "https://site.com/p?id=3", s"adjacent tracking mishandled: ${out(2)}")
    assert(out(3) == "site.com/a", s"schemeless URL collapsed: ${out(3)}")
  }

  test("canonicalizeUrl: tracking-only query and bare paths heal cleanly") {
    val out = Seq(
      "https://site.com/p/7/?utm_source=a",    // query vanishes entirely
      "https://site.com/p/7/",                 // trailing slash only
      "https://site.com/"                      // root path
    ).toDF("url")
      .select(UrlFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(out(0) == "https://site.com/p/7")
    assert(out(1) == "https://site.com/p/7")
    assert(out(2) == "https://site.com")
  }

  test("fsScoreMicro + bestMatch: weights sum and ties break on a-key ASC") {
    val pairs = Seq(
      // b=10: a=1 double-agree, a=2 one agree -> best is a=1
      (10L, 1L, true, true),
      (10L, 2L, true, false),
      // b=20: a=3 and a=4 both double-agree -> tie -> a=3 (ASC)
      (20L, 4L, true, true),
      (20L, 3L, true, true)
    ).toDF("b_id", "a_id", "agree1", "agree2")
    val scored = pairs.withColumn(
      "score_micro",
      Linkage.fsScoreMicro(Seq(
        Linkage.FieldWeight(col("agree1"), 100L, -200L),
        Linkage.FieldWeight(col("agree2"), 1000L, -2000L))))
    // score arithmetic
    val s = scored.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("score_micro")).toMap
    assert(s((10L, 1L)) == 1100L && s((10L, 2L)) == -1900L)
    val best = Linkage.bestMatch(scored, "b_id", "a_id", "score_micro")
      .collect().map(r => r.getAs[Long]("b_id") -> r.getAs[Long]("a_id")).toMap
    assert(best == Map(10L -> 1L, 20L -> 3L))
  }

  test("recordLinkage contract: precision profile is sane at sf0.001") {
    val out = graft.queries.CurationQueries.recordLinkage(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    val nPairs = out.map(_.getAs[Long]("n_pairs")).sum
    val nCorrect = out.map(_.getAs[Long]("n_correct")).sum
    assert(nCorrect <= nPairs)
    assert(nCorrect * 2 > nPairs, s"linkage precision below 50%: $nCorrect/$nPairs")
  }

  test("fdViolations: g3 error counts rows outside each group's majority") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("l_col", "r_col")
    val out = graft.ops.Profile.fdViolations(df, "t.l->r", "l_col", "r_col").head()
    assert(out.getAs[String]("fd") == "t.l->r")
    assert(out.getAs[Long]("n_rows") == 4L)
    assert(out.getAs[Long]("n_lhs") == 2L)
    assert(out.getAs[Long]("n_majority") == 3L)
    assert(out.getAs[Long]("violation_ppm") == 250000L)
  }

  test("approxDistinctAudit: exact counts per column, flag true, sampleMod subsets") {
    val df = (1L to 500L).map(i => (i, i % 7)).toDF("a", "b")
    val full = graft.ops.Profile.approxDistinctAudit(df, Seq("a", "b"))
      .orderBy("column").collect()
    assert(full.map(r => (r.getAs[String]("column"), r.getAs[Long]("n_exact"))).toSeq ==
      Seq(("a", 500L), ("b", 7L)))
    assert(full.forall(_.getAs[Boolean]("within_5pct")))
    // sampled mode audits a deterministic value subset: exact side must
    // equal a hand-filtered recount of the SAME md5-selected values
    val sampled = graft.ops.Profile.approxDistinctAudit(df, Seq("a"), sampleMod = 4)
      .head()
    val expected = df
      .selectExpr("cast(a as string) as v").distinct()
      .filter(expr("pmod(xxhash64(v), 4) = 0"))
      .count()
    assert(sampled.getAs[Long]("n_exact") == expected)
    assert(expected > 0L && expected < 500L)
    assert(sampled.getAs[Boolean]("within_5pct"))
  }

  test("fdViolations: majority tie breaks to the smallest rhs") {
    val df = Seq(("a", "y"), ("a", "x")).toDF("l_col", "r_col")
    // tie 1-1: majority is 'x' (smallest) — still 1 kept of 2 rows
    val out = graft.ops.Profile.fdViolations(df, "fd", "l_col", "r_col").head()
    assert(out.getAs[Long]("n_majority") == 1L)
    assert(out.getAs[Long]("violation_ppm") == 500000L)
  }

  test("modularityPpm: hand-computed triangle + pendant") {
    // edges 1-2, 2-3, 1-3, 3-4; partition {1,2,3} / {4}
    // m=4, L_1=3 D_1=7, L_2=0 D_2=1
    // contrib_1 = (48-49)*1e6 div 64 = -15625; contrib_2 = -15625
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L)).toDF("id", "label")
    val out = graft.ops.Graph.modularityPpm(edges, "a", "b", labels)
      .collect().map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("intra_edges"),
          r.getAs[Long]("degree_sum"), r.getAs[Long]("contrib_ppm"))).toMap
    assert(out(10L) == ((3L, 3L, 7L, -15625L)))
    assert(out(20L) == ((1L, 0L, 1L, -15625L)))
  }

  test("modularityPpm: a clean two-clique partition scores positive") {
    // two triangles joined by one bridge: Q > 0 for the natural split
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L)).toDF("a", "b")
    val labels = (Seq((1L, 1L), (2L, 1L), (3L, 1L)) ++ Seq((4L, 2L), (5L, 2L), (6L, 2L)))
      .toDF("id", "label")
    val q = graft.ops.Graph.modularityPpm(edges, "a", "b", labels)
      .agg(org.apache.spark.sql.functions.sum($"contrib_ppm")).head().getLong(0)
    assert(q > 300000L, s"two-clique modularity should be strongly positive, got $q")
  }

  test("encodeVocab: exhausted rounds keep the vocabulary; learnMerges emits no sentinel") {
    // 'ab' admits exactly ONE merge; rounds = 4 exhausts after round 1
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val enc = graft.functions.Bpe.encodeVocab(docs, "text", rounds = 4)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_symbols")).toMap
    assert(enc == Map("ab" -> 1L, "cd" -> 1L),
      s"exhausted rounds must be identity rewrites, got $enc")
    val merges = graft.functions.Bpe.learnMerges(docs, "text", rounds = 4).collect()
    assert(merges.length == 2, // (a,b) then (c,d); rounds 3-4 exhausted -> no rows
      s"exhausted rounds must emit nothing: ${merges.mkString(",")}")
  }

  test("encodeVocab: merges apply greedily left-to-right through runs") {
    // 'abab' needs merge (a,b) TWICE in one word, then (ab,ab) once —
    // the double-separator rewrite must survive consecutive matches
    val docs = Seq((1L, "abab abab cd")).toDF("doc_id", "text")
    val out = graft.functions.Bpe.encodeVocab(docs, "text", rounds = 2)
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("wc"), r.getAs[Long]("n_symbols"))).toMap
    assert(out("abab") == ((2L, 1L)), "two rounds: ab+ab -> abab, one symbol")
    assert(out("cd") == ((1L, 2L)), "cd never wins a merge: stays 2 chars")
  }

  test("mutualInfoNano: self-MI equals entropy, NMI of a copy is exactly 1") {
    val df = Seq("a", "a", "b", "c").toDF("x").withColumn("y", col("x"))
    val r = graft.ops.Stats.mutualInfoNano(df, "x", "y", "x~x").head()
    assert(r.getAs[Long]("mi_nano") == r.getAs[Long]("h_x_nano"))
    assert(r.getAs[Long]("h_x_nano") == r.getAs[Long]("h_y_nano"))
    assert(r.getAs[Long]("nmi_micro") == 1000000L)
  }

  test("mutualInfoNano: independent columns score ~0") {
    // perfectly balanced 2x2 independence: every cell nij*n == ni*nj
    val df = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v")).toDF("x", "y")
    val r = graft.ops.Stats.mutualInfoNano(df, "x", "y", "ind").head()
    assert(r.getAs[Long]("mi_nano") == 0L, "independence must give exactly 0 (ln 1 per cell)")
    assert(r.getAs[Long]("nmi_micro") == 0L)
  }

  test("datasetCard: nine metrics, internally consistent at sf0.001") {
    val card = graft.queries.CurationQueries.datasetCard(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card.size == 9)
    assert(card("n_docs") > 0 && card("n_tokens") > 0)
    assert(card("mean_tokens_ppm") == card("n_tokens") * 1000000L / card("n_docs"))
    assert(card("exact_dup_ppm") >= 0 && card("exact_dup_ppm") <= 1000000L)
    assert(card("top_source_share_ppm") * 20 >= 1000000L,
      "20 sources: max share must be >= uniform share")
    // 5 langs: entropy bounded by ln(5) micro-nats
    assert(card("lang_entropy_micro") <= 1609438L)
  }

  test("weightedNegatives: draws are true negatives with bounded indices") {
    val dir = sf("sf0.001")
    val out = graft.queries.EventQueries.weightedNegatives(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("draw_idx")
      assert(d >= 1L && d <= 3L)
    }
    // every emitted (user, item) must be absent from the user's history
    val seen = graft.pipeline.Pipeline.enrichedEvents(spark, dir)
      .select(col("user_id"), col("item_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val key = (r.getAs[Long]("user_id"), r.getAs[Long]("neg_item"))
      assert(!seen.contains(key), s"sampled a seen item: $key")
    }
  }

  test("f1ThresholdSweep: integer F1 consistency and descending rank") {
    val out = graft.queries.EventQueries.f1ThresholdSweep(spark, sf("sf0.001")).collect()
    assert(out.length == 5)
    out.foreach { r =>
      val (tp, fp, fn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"))
      assert(r.getAs[Long]("f1_ppm") == 2 * tp * 1000000L / (2 * tp + fp + fn))
      assert(r.getAs[Long]("precision_ppm") == tp * 1000000L / (tp + fp))
      assert(r.getAs[Long]("recall_ppm") == tp * 1000000L / (tp + fn))
    }
    val f1s = out.map(_.getAs[Long]("f1_ppm"))
    assert(f1s.zip(f1s.tail).forall { case (a, b) => a >= b }, "rows must rank by F1 desc")
  }

  test("isotropyAudit: identical vectors ~1, orthogonal vectors exactly 0") {
    def run(vecs: Seq[Array[Float]]): Long = {
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
        .toDF("vec_id", "embedding")
      graft.similarity.Similarity.isotropyAudit(df, "embedding")
        .head().getAs[Long]("avg_pair_cos_micro")
    }
    val v = Array.tabulate(4)(i => (i + 1).toFloat)
    assert(run(Seq(v, v, v, v)) > 999000L, "identical vectors: mean pair cosine ~ 1")
    val e1 = Array(1f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f)
    assert(run(Seq(e1, e2)) == 0L, "orthogonal pair: exactly 0")
  }

  test("pinballEval: three quantiles over the same scored days, losses non-negative") {
    val out = graft.queries.EventQueries.pinballEval(spark, sf("sf0.001")).collect()
    assert(out.map(_.getAs[Long]("tau_ppm")).toSeq == Seq(100000L, 500000L, 900000L))
    val days = out.map(_.getAs[Long]("n_days")).distinct
    assert(days.length == 1 && days.head > 0, "every tau scores the same day set")
    out.foreach { r =>
      val sum = r.getAs[Long]("sum_loss_ppm_cents")
      assert(sum >= 0L, "pinball loss is non-negative by construction")
      assert(r.getAs[Long]("avg_loss_cents") == sum / r.getAs[Long]("n_days") / 1000000L)
    }
  }

  test("rboRankings: depth terms well-formed, overlap monotone and bounded") {
    val out = graft.queries.EventQueries.rboRankings(spark, sf("sf0.001"))
      .collect().sortBy(_.getAs[Long]("d"))
    assert(out.length == 10)
    var prev = 0L
    out.foreach { r =>
      val (d, ov, pp, t) = (r.getAs[Long]("d"), r.getAs[Long]("overlap"),
        r.getAs[Long]("ppow_micro"), r.getAs[Long]("term_micro"))
      assert(ov >= prev && ov <= d, s"overlap not monotone/bounded at d=$d: $ov")
      assert(t == ov * pp / (10 * d), s"term formula broken at d=$d")
      prev = ov
    }
    // exact p-power table really is 9^(d-1)*1e6 // 10^(d-1)
    graft.queries.EventQueries.rboPpowMicro.foreach { case (d, p) =>
      assert(p == BigInt(9).pow(d.toInt - 1) * 1000000 / BigInt(10).pow(d.toInt - 1))
    }
  }

  test("rendezvousShards: minimal disruption — only the removed shard's keys move") {
    val out = graft.queries.RelationalQueries.rendezvousShards(spark, sf("sf0.001"))
      .collect()
      .map(r => (r.getAs[Long]("shard_before"), r.getAs[Long]("shard_after"), r.getAs[Long]("n_keys")))
    assert(out.nonEmpty)
    out.foreach { case (b, a, _) =>
      assert(b == a || b == 3L, s"key moved between surviving shards: $b -> $a")
      assert(a != 3L, "keys must not land on the removed shard")
    }
    assert(out.exists { case (b, _, _) => b == 3L }, "removed shard had keys to move")
  }

  test("sketchQuantileAudit: exact/sketch ratio within the 16-sub-bucket bound") {
    val out = graft.queries.RelationalQueries.sketchQuantileAudit(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ratio = r.getAs[Long]("ratio_ppm")
      assert(ratio >= 1000000L && ratio < 1062500L,
        s"sketch bound violated for ${r.getAs[String]("g")}/${r.getAs[String]("q")}: $ratio")
    }
  }

  test("tokenizerFertility: ppm ratios are exact integer div of the sums") {
    val out = graft.queries.TextQueries.tokenizerFertility(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val bpe = r.getAs[Long]("n_bpe_tokens")
      val ws = r.getAs[Long]("n_ws_tokens")
      val chars = r.getAs[Long]("n_chars")
      assert(r.getAs[Long]("fertility_ppm") == bpe * 1000000L / ws)
      assert(r.getAs[Long]("chars_per_bpe_ppm") == chars * 1000000L / bpe)
      assert(bpe >= ws, "BPE-ish tokenization is at least word-granular on this corpus")
    }
  }
}
