package graft

import graft.queries.{CurationQueries => CQ, TextQueries => TQ}
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Invariants for the round-9 selection/mining block (q266–q272):
  * int8 quantization audit, temperature budget apportionment, greedy
  * coverage selection, k-center coreset, mutual-kNN pair mining,
  * LSH hard negatives, tail-vocabulary docs. Cross-engine value
  * equality is the Verify/DuckDB gate; these pin the mathematical
  * invariants each operator promises.
  */
class SelectionMiningSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("int8QuantAudit: error bounded by half an int8 step, cosine ≥ 0.999") {
    val out = TQ.int8Quant(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val maxErr = r.getAs[Long]("max_err_ppm")
      val minCos = r.getAs[Long]("min_cos_micro")
      // |v·127/m − round(v·127/m)| ≤ 0.5 ⇒ err ≤ 0.5/127 = 3937 ppm
      assert(maxErr >= 0L && maxErr <= 3938L, s"err $maxErr out of int8 bound")
      assert(minCos >= 999000L, s"int8 cosine $minCos below 0.999")
    }
  }

  test("temperatureMixture: allocation sums to the budget exactly") {
    val out = CQ.temperatureMixture(spark, dir, budget = 999983L)
    val total = out.agg(sum(col("alloc_tokens"))).head().getLong(0)
    assert(total == 999983L) // largest-remainder: exact by construction
    // tempered weight really is floor(sqrt(n))
    out.collect().foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val w = r.getAs[Long]("weight")
      assert(w * w <= n && (w + 1) * (w + 1) > n)
    }
  }

  test("greedyCoverage: gains non-increasing, coverage cumulative and ≤ 1") {
    val picks = CQ.greedyCoverage(spark, dir, rounds = 4)
      .orderBy(col("round")).collect()
    assert(picks.length == 4)
    val gains = picks.map(_.getAs[Long]("gain"))
    // marginal gains of greedy on a submodular objective never increase
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b }, gains.toSeq)
    val cums = picks.map(_.getAs[Long]("cum_covered"))
    assert(cums.zip(gains).map { case (c, g) => c - g }.toSeq ==
      (0L +: cums.init.toSeq))
    assert(picks.map(_.getAs[Long]("coverage_ppm")).forall(p => p > 0 && p <= 1000000L))
    // picked docs are distinct
    assert(picks.map(_.getAs[Long]("doc_id")).distinct.length == 4)
  }

  test("kCenterGreedy: cover radius non-increasing, centers distinct") {
    val out = TQ.kcenterCoreset(spark, dir).orderBy(col("round")).collect()
    assert(out.length == 4)
    val radii = out.drop(1).map(_.getAs[Long]("radius_d2"))
    // farthest-point traversal: each new pick is nearer the chosen set
    // than its predecessor was (monotone cover radius)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b }, radii.toSeq)
    assert(radii.forall(_ > 0L))
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == 4)
  }

  test("mutualKnn: oriented unique pairs, genuinely reciprocal") {
    val emb = graft.core.Tables.embeddings(spark, dir)
    val pairs = Similarity.mutualKnn(emb, "vec_id", "embedding").collect()
    assert(pairs.nonEmpty)
    val keys = pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(keys.forall { case (a, b) => a < b })
    assert(keys.distinct.length == keys.length)
    // reciprocity on a planted fixture: 1 and 2 are exactly parallel
    // (cos = 1, each other's top-1); 3 points at 1 but 1 prefers 2 —
    // the hub-suppression case reciprocity exists to remove
    val planted = Seq(
      (1L, Seq.fill(8)(0.9f)), (2L, Seq.fill(8)(0.91f)),
      (3L, Seq(0.9f) ++ Seq.fill(7)(0.89f)))
      .toDF("vec_id", "embedding")
    val p = Similarity.mutualKnn(planted, "vec_id", "embedding", planes = 2, dim = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(p == Set((1L, 2L)), s"expected exactly the mutual pair, got $p")
  }

  test("hardNegatives: cross-label only, anchors on the sample grid, k bounded") {
    val out = TQ.hardNegativesLsh(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("query_id") % 50 == 0)
      assert(r.getAs[Long]("query_label") != r.getAs[Long]("neighbor_label"))
      assert(r.getAs[Int]("rn") >= 1 && r.getAs[Int]("rn") <= 3)
    }
  }

  test("tCloseness: uniform sensitive ⇒ EMD 0; disjoint classes ⇒ EMD large") {
    // two QI classes, sensitive identical in both -> every class matches
    // the global distribution exactly
    val even = Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L))
      .toDF("qi", "sv")
    val e = graft.ops.Privacy
      .tCloseness(even, Seq(col("qi")), col("sv"), tPpm = 200000L).head()
    assert(e.getAs[Long]("max_emd_ppm") == 0L)
    assert(e.getAs[Long]("classes_above_t") == 0L)
    // classes own disjoint sensitive values -> maximal skew, both flagged
    val skew = Seq(("a", 0L), ("a", 0L), ("b", 1L), ("b", 1L))
      .toDF("qi", "sv")
    val s2 = graft.ops.Privacy
      .tCloseness(skew, Seq(col("qi")), col("sv"), tPpm = 200000L).head()
    // |1.0 − 0.5| at the first cum point, m−1 = 1 ⇒ 500000 ppm
    assert(s2.getAs[Long]("max_emd_ppm") == 500000L)
    assert(s2.getAs[Long]("classes_above_t") == 2L)
    assert(s2.getAs[Long]("rows_above_t_ppm") == 1000000L)
  }

  test("embeddingAnova: label-aligned vectors ⇒ r2 ≈ 1; wss+bss ≈ tss") {
    // two tight clusters far apart, perfectly label-aligned
    val planted = Seq(
      (1L, 0, Seq(1.0f, 0.0f)), (2L, 0, Seq(1.0f, 0.01f)),
      (3L, 1, Seq(-1.0f, 0.0f)), (4L, 1, Seq(-1.0f, -0.01f)))
      .toDF("vec_id", "label", "embedding")
    val r = Similarity.embeddingAnova(planted, "vec_id", "label", "embedding").head()
    assert(r.getAs[Long]("n_vectors") == 4L && r.getAs[Long]("n_labels") == 2L)
    assert(r.getAs[Long]("r2_micro") > 990000L, s"r2 ${r.getAs[Long]("r2_micro")}")
    val (wss, bss, tss) =
      (r.getAs[Long]("wss"), r.getAs[Long]("bss"), r.getAs[Long]("tss"))
    // floor-int centroids: decomposition holds up to quantization slack
    assert(math.abs(wss + bss - tss) <= tss / 100 + 64,
      s"wss=$wss bss=$bss tss=$tss")
    // real table: r2 in range and decomposition slack small
    val full = TQ.embeddingAnova(spark, dir).head()
    val r2 = full.getAs[Long]("r2_micro")
    assert(r2 >= 0L && r2 <= 1000000L)
  }

  test("curriculumSchedule: partition of the corpus, difficulty-ordered epochs") {
    val nDocs = graft.core.Tables.documents(spark, dir).count()
    val out = CQ.curriculumSchedule(spark, dir).orderBy(col("epoch")).collect()
    assert(out.map(_.getAs[Long]("n_new")).sum == nDocs) // every doc admitted once
    val cums = out.map(_.getAs[Long]("n_cum"))
    assert(cums.last == nDocs && cums.zip(cums.tail).forall { case (a, b) => a < b })
    assert(out.forall { r =>
      val e = r.getAs[Long]("epoch"); e >= 1L && e <= 5L
    })
    // range pacing: later epochs hold strictly harder slices
    val means = out.map(_.getAs[Long]("mean_diff_milli"))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b }, means.toSeq)
  }

  test("semanticDecontam: planted cross-half near-dup tops the report flagged") {
    // find one id in each md5-parity half (the operator's split rule)
    def half(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16) % 2
    }
    val ids = (1L to 40L)
    val trainId = ids.find(half(_) == 0L).get
    val benchId = ids.find(half(_) == 1L).get
    val rows = ids.map { id =>
      val emb =
        if (id == trainId || id == benchId) Seq.fill(8)(0.5f)
        else Seq.tabulate(8)(i => if (i == (id % 8).toInt) 1.0f else 0.01f * id)
      (id, emb)
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity
      .semanticDecontam(df, "vec_id", "embedding", planes = 2, dim = 8)
      .collect()
    assert(out.nonEmpty && out.length <= 20)
    val top = out.head
    assert(top.getAs[Long]("train_id") == trainId &&
      top.getAs[Long]("bench_id") == benchId)
    assert(top.getAs[Long]("cos_micro") == 1000000L)
    assert(top.getAs[Long]("flagged") == 1L)
    // flag bit everywhere consistent with the threshold
    out.foreach { r =>
      assert((r.getAs[Long]("cos_micro") >= 995000L) ==
        (r.getAs[Long]("flagged") == 1L))
    }
  }

  test("knnOutliers: isolation-ordered, sentinel consistent, self excluded") {
    val out = TQ.knnOutliers(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    val cos = out.map(_.getAs[Long]("nearest_cos_micro"))
    assert(cos.zip(cos.tail).forall { case (a, b) => a <= b }) // most isolated first
    out.foreach { r =>
      val nid = r.getAs[Long]("nearest_id")
      assert(nid != r.getAs[Long]("vec_id"))
      // lone-bucket sentinel: -1 id iff -1e6 cosine
      assert((nid == -1L) == (r.getAs[Long]("nearest_cos_micro") == -1000000L))
    }
  }

  test("dedupBySource: ledger consistent with global exact dedup") {
    val docs = graft.core.Tables.documents(spark, dir)
    val nFps = docs
      .select(graft.functions.TextFunctions.fingerprint(col("text"))).distinct().count()
    val out = CQ.dedupBySource(spark, dir).collect()
    assert(out.map(_.getAs[Long]("n_kept_docs")).sum == nFps) // one survivor per fp
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("n_tokens"))
      val ppm = r.getAs[Long]("removed_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
    }
  }

  test("blockingQuality: hits bounded by both sides, ratios in range") {
    val r = CQ.blockingQuality(spark, dir).head()
    val (t, c, h) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_candidates"),
      r.getAs[Long]("n_hits"))
    assert(h <= t && h <= c) // hits are an intersection
    val recall = r.getAs[Long]("pairs_recall_ppm")
    val red = r.getAs[Long]("reduction_ppm")
    assert(recall >= 0L && recall <= 1000000L)
    assert(red >= 0L && red <= 1000000L)
    // the production banding config should actually block well here
    assert(red >= 990000L, s"reduction $red — blocking barely prunes")
  }

  test("ivfRecallAudit: recall above the pinned floor, identities hold") {
    val r = TQ.ivfRecallAudit(spark, dir).head()
    assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_exact"))
    // the same 0.7 recall floor SimilaritySpec pins for the q41 config
    assert(r.getAs[Long]("recall_ppm") >= 700000L,
      s"IVF recall ${r.getAs[Long]("recall_ppm")} ppm below floor")
    assert(r.getAs[Long]("min_recall_ppm") <= r.getAs[Long]("recall_ppm"))
  }

  test("kCenterGreedy: corpus smaller than k ends the trace, no throw") {
    val tiny = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kCenterGreedy(tiny, "vec_id", "embedding", k = 5)
    assert(out.count() == 2L) // both picked, then exhaustion
    val empty = tiny.filter(col("vec_id") < 0L)
    assert(Similarity.kCenterGreedy(empty, "vec_id", "embedding", k = 3).count() == 0L)
  }

  test("rareTokenDocs: shares in [0, 1e6], cut bounded, tail set drives counts") {
    val out = CQ.rareTokenDocs(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { r =>
      val ppm = r.getAs[Long]("rare_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      assert(r.getAs[Long]("n_rare") <= r.getAs[Long]("n_tokens"))
    }
  }
}
