package graft

import graft.queries.{CurationQueries, RelationalQueries}
import org.apache.spark.sql.functions._

/** The sampled-audit modes of the two exact-reference audits
  * (q279 blocking quality, q297 sketch accuracy). Both audits keep an
  * EXACT ground-truth side that is support-sized by design and cannot
  * run unsampled at 100 TB; the `sampleMod` knob estimates the same
  * statistic on a deterministic md5 sample. These tests pin the
  * estimators against the exact answers at test scale — the error
  * bound that makes the sampled numbers trustworthy at the scale where
  * no exact number exists.
  */
class SampledAuditSpec extends SparkSpec {

  test("q279 sampled pairs-completeness tracks the exact audit") {
    val docs = graft.core.Tables.documents(spark, sf("sf0.01"))
    val exact = CurationQueries.blockingQualityAudit(docs, sampleMod = 1L).head()
    val sampled = CurationQueries.blockingQualityAudit(docs, sampleMod = 2L).head()
    // candidate/reduction side is the full production blocking in both
    assert(sampled.getAs[Long]("n_candidates") == exact.getAs[Long]("n_candidates"))
    assert(sampled.getAs[Long]("reduction_ppm") == exact.getAs[Long]("reduction_ppm"))
    // the sampled ground truth is a real subsample...
    val (nTrueEx, nTrueSm) =
      (exact.getAs[Long]("n_true"), sampled.getAs[Long]("n_true"))
    assert(nTrueSm > 0 && nTrueSm < nTrueEx,
      s"sampled n_true $nTrueSm vs exact $nTrueEx")
    // ...and the completeness ESTIMATE stays inside a ±10-point band
    // of the exact value (exact measures 1.0 at this banding config;
    // a doc sample can only lose whole pairs, never invent them)
    val (rEx, rSm) = (
      exact.getAs[Long]("pairs_recall_ppm"),
      sampled.getAs[Long]("pairs_recall_ppm"))
    assert(math.abs(rEx - rSm) <= 100000L,
      s"sampled recall $rSm ppm vs exact $rEx ppm")
  }

  test("q179 sampled repeat ranges: exact on the induced sub-corpus, conservative burden") {
    import graft.dedup.Dedup
    val docs = graft.core.Tables.documents(spark, sf("sf0.01"))
    def burdens(mod: Long): Map[String, Long] =
      Dedup.maximalRepeatRangesAudit(docs, "text", "doc_id", minLen = 16, sampleMod = mod)
        .groupBy(col("doc_id"))
        .agg(sum(col("end_pos") - col("start_pos")).as("burden"))
        .collect()
        .map(r => r.get(0).toString -> r.getAs[Long]("burden"))
        .toMap
    val exact = burdens(1L)
    val sampled = burdens(2L)
    assert(sampled.nonEmpty, "sampled audit found no repeats — vacuous fixture")
    // sampled docs are a strict subset of the corpus
    assert(sampled.keySet.subsetOf(exact.keySet),
      s"sampled docs outside the exact audit: ${sampled.keySet -- exact.keySet}")
    // sampling can only LOSE witnesses, never invent ranges: every
    // sampled doc's burden is <= its exact burden (conservative audit)
    sampled.foreach { case (d, b) =>
      assert(exact.contains(d) && b <= exact(d),
        s"doc $d sampled burden $b exceeds exact ${exact.get(d)}")
    }
    // and the estimator is non-degenerate: the sample retains a real
    // share of its docs' exact burden
    // keysIterator, NOT .keys.map: Map#keys is a Set, and mapping a
    // Set through the burden lookup dedupes equal burden values
    val exactOnSample = sampled.keysIterator.map(exact).sum
    val ratio = sampled.values.sum.toDouble / exactOnSample
    info(s"sampled/exact burden on sampled docs = $ratio " +
      s"(${sampled.values.sum} / $exactOnSample over ${sampled.size} docs)")
    assert(ratio > 0.3 && ratio <= 1.0, s"burden ratio $ratio out of band")
  }

  test("q297 sampled exact-side quantiles track the full order statistics") {
    val vals = graft.core.Tables.lineitem(spark, sf("sf0.01")).select(
      col("l_returnflag").as("g"),
      expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"),
      expr("concat(cast(l_orderkey as string), '_', cast(l_linenumber as string))")
        .as("rk"))
    def byKey(mod: Long): Map[(String, String), (Long, Long)] =
      RelationalQueries.sketchQuantileAuditOn(vals, sampleMod = mod)
        .collect()
        .map(r => (r.getAs[String]("g"), r.getAs[String]("q")) ->
          (r.getAs[Long]("exact_cents"), r.getAs[Long]("sketch_lb_cents")))
        .toMap
    val exact = byKey(1L)
    val sampled = byKey(4L)
    assert(sampled.keySet == exact.keySet)
    exact.foreach { case (k, (exCents, exSketch)) =>
      val (smCents, smSketch) = sampled(k)
      // the sketch side is identical — sampling touches only the
      // exact reference
      assert(smSketch == exSketch, s"$k sketch side moved under sampling")
      // a 25% row sample's order statistic stays within 5% relative
      // error of the population quantile at this n (~60k rows/group)
      val rel = math.abs(smCents - exCents).toDouble / exCents
      assert(rel < 0.05, s"$k sampled $smCents vs exact $exCents (rel $rel)")
    }
  }
}
