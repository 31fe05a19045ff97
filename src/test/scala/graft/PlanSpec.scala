package graft

import graft.ops.Windows
import graft.queries.{EventQueries, RelationalQueries}
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions — the properties that make these
  * operators survive a 100× scale-up (SURVEY.md §4): filter/column
  * pushdown into the parquet scan, broadcast joins for dimensions,
  * top-k without a global sort, a single exchange for sessionization,
  * and no accidental cartesian products.
  */
class PlanSpec extends SparkSpec {

  private val dir = sf("sf0.001")
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filterProject: predicate + projection pushed into parquet scan") {
    val p = plan(RelationalQueries.filterProject(spark, dir))
    assert(p.contains("PushedFilters"))
    assert(p.contains("l_shipdate"), "shipdate filter must reach the scan")
    // pruned scan: untouched wide columns must not be read
    assert(!p.contains("l_comment"), "scan reads a column the query never uses")
  }

  test("joinAgg: dimension side is broadcast (no shuffle of the fact)") {
    assert(plan(RelationalQueries.joinAgg(spark, dir)).contains("BroadcastHashJoin"))
  }

  test("globalTopK: TakeOrderedAndProject, not a global sort") {
    val p = plan(RelationalQueries.globalTopK(spark, dir))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("sessionize: both windows share ONE exchange on the user key") {
    val df = Windows.sessionize(
      graft.core.Tables.events(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id")))
    val p = plan(df)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange, plan has $exchanges:\n$p")
  }

  test("topKPerGroup query: agg and window share ONE exchange on the window key") {
    val p = plan(RelationalQueries.topKPerGroup(spark, dir))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"pre-partitioning on l_suppkey must serve both the pair agg and the window:\n$p")
  }

  test("popularity candidates: top-k dim joined via broadcast, no shuffle") {
    val p = plan(EventQueries.popularityCandidates(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("covis pair-generation plans no cartesian product") {
    val p = plan(EventQueries.covisPairs(spark, dir))
    assert(!p.contains("CartesianProduct"), "covis self-join degenerated to cartesian")
  }

  test("whole-stage codegen covers the text-scoring pipeline") {
    val df = graft.queries.TextQueries.qualityScore(spark, dir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen subtree"), "text functions fell out of codegen")
  }

  test("stratified hash sample: filter runs scan-side, zero exchanges") {
    val p = plan(
      graft.ops.Sampling.stratifiedHashSample(
        graft.core.Tables.events(spark, dir), "event_id", "event_type",
        Map("purchase" -> 1000), defaultPermille = 100))
    assert(!p.contains("Exchange"), s"hash sampling must not shuffle:\n$p")
  }

  test("contamination: benchmark side broadcast, corpus never shuffled pre-join") {
    val docs = graft.core.Tables.documents(spark, dir)
    val p = plan(graft.dedup.Dedup.contamination(
      docs.filter(col("doc_id") % 7 =!= 3), docs.filter(col("doc_id") % 7 === 3),
      "text", "doc_id", n = 8))
    assert(p.contains("BroadcastHashJoin"), s"benchmark side must broadcast:\n$p")
  }

  test("bm25: corpus stats arrive via broadcast, not a driver collect") {
    val p = plan(graft.functions.TextRanking.bm25Scores(
      graft.core.Tables.documents(spark, dir), "text", "doc_id", Seq("table", "scan")))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("repetition query: per-doc stats stay scan-side, zero hash exchanges") {
    val p = plan(graft.queries.TextQueries.repetitionScore(spark, dir))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 0,
      s"repetition_stats must not shuffle n-grams (only the display sort ranges):\n$p")
  }

  test("repetition query: the one-pass expression is evaluated ONCE per row") {
    val p = plan(graft.queries.TextQueries.repetitionScore(spark, dir))
    val evals = "repetition_stats".r.findAllIn(p).length
    assert(evals == 1,
      s"filter pushdown must not duplicate the per-row n-gram pass ($evals evals):\n$p")
  }

  test("winsorize: per-group thresholds re-attach via broadcast") {
    val p = plan(RelationalQueries.winsorize(spark, dir))
    assert(p.contains("BroadcastHashJoin"),
      s"3-row threshold table must broadcast, not shuffle the fact:\n$p")
    // support-grain since r13: both ppm ranks come off a sharded cumsum
    // over the (group, value, count) support — never a row_number over
    // raw rows partitioned by the ~4-value group key (one hot task per
    // group; the r12 #3 wall line)
    assert(!p.contains("row_number"),
      s"winsorize must read ranks off the support cumsum, not a row-rate rank window:\n$p")
  }

  test("madOutliers: support-grain medians, no row-rate rank window") {
    val p = plan(RelationalQueries.madOutliers(spark, dir))
    assert(!p.contains("row_number"),
      s"madOutliers must take medians from count-compressed supports (q171 shape):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"median/MAD tables must re-attach via broadcast:\n$p")
  }

  test("target encoding: global prior arrives via broadcast, one fact pass") {
    val p = plan(EventQueries.targetEncoding(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("negative samples: popularity pool is a broadcast, no cartesian") {
    val p = plan(EventQueries.negativeSamples(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"anchors x top-10 pool must be a broadcast nested loop:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("dup spans: occurrence counting shuffles once by fingerprint, no self-join") {
    val p = plan(graft.dedup.Dedup.duplicatedSpans(
      graft.core.Tables.documents(spark, dir), "text", "doc_id", 64, 32))
    assert(!p.contains("Join"), s"span counting must not join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2, // fp window + doc_id agg
      s"expected fp + doc_id exchanges only:\n$p")
  }

  test("temperature mix: rates broadcast back, corpus never hash-exchanged") {
    val p = plan(graft.ops.Sampling.temperatureMixSqrt(
      graft.core.Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), length(col("text")).cast("long").as("w")),
      "source", col("w"), "doc_id"))
    assert(p.contains("BroadcastHashJoin"), s"rates must broadcast:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, // the per-source size aggregation only
      s"only the size agg may hash-exchange; the corpus filter is scan-side:\n$p")
  }

  test("token budget: one exchange keyed by group for the running sum") {
    val p = plan(graft.ops.Sampling.tokenBudgetCap(
      graft.core.Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), length(col("text")).cast("long").as("w")),
      "source", col("w"), "doc_id", col("w"), 1000L))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected the group window exchange only:\n$p")
  }

  test("substring repeats: no join, fp + doc exchanges only") {
    val p = plan(graft.dedup.Dedup.maximalRepeatRanges(
      graft.core.Tables.documents(spark, dir), "text", "doc_id", 48))
    assert(!p.contains("Join"), s"window-occurrence counting must not join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2, // fp occurrence window + doc_id islands/agg
      s"expected fp + doc_id exchanges only:\n$p")
  }

  test("word_shingles + minhash_signature stay inside whole-stage codegen") {
    // these were CodegenFallback through round 5, which forced the
    // project out of the scan stage's codegen span on the three hottest
    // text queries (q28/q42/q85)
    val df = graft.core.Tables.documents(spark, dir).select(
      col("doc_id"),
      org.apache.spark.sql.graft.MinHashSignature(
        org.apache.spark.sql.graft.WordShingles(col("text"), 5), 16).as("sig"))
    val p = plan(df)
    assert(
      p.linesIterator.exists(l => l.contains("word_shingles") && l.contains("*(")),
      s"shingle/minhash project fell out of WholeStageCodegen:\n$p")
  }

  test("feature hashing: one aggregation keyed by bucket, scan-side hash") {
    val p = plan(graft.ops.FeatureEng.featureHash(
      graft.core.Tables.documents(spark, dir), "text", 64))
    assert(!p.contains("Join"))
  }

  test("pq_adc scan stays inside whole-stage codegen (q155 ADC stage)") {
    // the compressed-codes scan is the whole point of PQ at scale: the
    // gather must not fall out of the scan stage's codegen span
    val df = spark.range(10).selectExpr(
      "array(id % 2, (id + 1) % 2) AS codes", "array(1L, 2L, 3L, 4L) AS lut")
      .select(org.apache.spark.sql.graft.VectorExpressions
        .pqAdcScore(col("codes"), col("lut"), 2).as("adc"))
    val p = plan(df)
    assert(
      p.linesIterator.exists(l => l.contains("pq_adc") && l.contains("*(")),
      s"pq_adc fell out of WholeStageCodegen:\n$p")
  }

  test("gini stumps: windows run over the aggregated feature table, not events") {
    // the prefix-sum windows must sit ABOVE the (feature, fval) agg —
    // their exchange is catalog-sized; the only event-sized exchange is
    // the aggregation itself
    val p = plan(EventQueries.giniStumps(spark, dir))
    val aggFirst = p.indexOf("HashAggregate")
    val winFirst = p.indexOf("Window")
    assert(aggFirst >= 0 && winFirst >= 0)
    assert(winFirst < aggFirst, // executedPlan prints top-down: window above agg
      s"expected Window above HashAggregate (agg-then-window):\n$p")
  }

  test("mann-whitney: single row out, no event-level window") {
    val p = plan(EventQueries.mannWhitneyU(spark, dir))
    // the cumulative window partitions the distinct-value support —
    // upstream of it must be the value aggregation, not raw events
    val winIdx = p.indexOf("Window")
    val aggBelow = p.indexOf("HashAggregate", winIdx)
    assert(winIdx >= 0 && aggBelow > winIdx,
      s"expected the support aggregation BELOW the cumulative window:\n$p")
  }

  test("cross-SF strategy shifts (q117/q171/q272/q185): small-regime shapes pinned") {
    // The four REAL cross-SF fingerprint diffs are size-based planner
    // choices adjudicated per regime (DESIGN.md, VERDICT r15 item 4):
    // - q117: the prefix-strategy LeftSemi broadcasts while the
    //   candidate side fits and flips to shuffle SMJ once BOTH sides
    //   are corpus-rate — at 100× the SMJ is the right plan, and
    //   forcing a broadcast hint would be the actual scale bug. Pin
    //   the small-regime broadcast here so a config/hint regression
    //   (e.g. autoBroadcastThreshold disabled) is caught.
    // - q171/q272: build-side flips of a broadcast join whose build
    //   side is free to flip — pin that the join STAYS broadcast.
    // - q185: Spark injects a runtime bloom filter only past the
    //   injection threshold — pin its absence in the small regime
    //   (its appearance at scale is the feature working).
    val p117 = plan(SparkEntry.queries("q117_strategy_recall")(spark, dir))
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(p117).isDefined,
      "q117 small regime: prefix LeftSemi should broadcast")
    assert(plan(SparkEntry.queries("q171_mad_cents")(spark, dir))
      .contains("BroadcastHashJoin"), "q171: event_type join should broadcast")
    assert(plan(SparkEntry.queries("q272_rare_token_docs")(spark, dir))
      .contains("BroadcastHashJoin"), "q272: doc_id join should broadcast")
    assert(!plan(SparkEntry.queries("q185_mcnemar")(spark, dir))
      .contains("might_contain"),
      "q185 small regime: runtime bloom filter below injection threshold")
  }

  test("no contract query plans an unpartitioned Window over unbounded input") {
    // the one scale-killer class a green oracle can hide: a global
    // `Window.orderBy(...)` pulls its whole input into ONE task. The
    // engine's answer is Windows.shardedCumsum(By); any remaining
    // empty-partition-spec Window must be over a provably BOUNDED
    // input (a day-grained series, a fixed replicate table) and be
    // allowlisted here with that justification.
    val allowlist: Set[String] = Set(
      // day-bounded series: the window input is the daily aggregate
      // (thousands of rows for decade-long logs), not events/support
      "q147_cusum_drift",
      // no-order min() window over the per-SOURCE size table — bounded
      // by the mixture's source catalog (dozens), deliberately a window
      // so the corpus-side aggregation runs once (PlanSpec pins one
      // corpus exchange for temperatureMixSqrt)
      "q132_temperature_mix"
    )
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, f) =>
      if (allowlist.contains(name)) Seq.empty
      else {
        val plan = f(spark, dir).queryExecution.optimizedPlan
        plan.collect {
          // the one structurally-recognized exception: shardedCumsumBy's
          // level-2 offsets window, ordered by its `__cumsup` super-shard
          // column — its input is the SUPER-shard totals table, at most
          // shards/65536 rows by the operator's two-level construction
          // (Windows.scala), not a per-query judgment call
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty &&
                // nonEmpty: an unpartitioned UNORDERED window is still a
                // single-task global window — forall alone is vacuously
                // true on an empty orderSpec (ADVICE r13)
                !(w.orderSpec.nonEmpty && w.orderSpec.forall(_.child match {
                  case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
                    // __cumsup: shardedCumsumBy's super-shard totals
                    // (≤ shards/65536 rows). __b1: ranksHotBucket's
                    // level-1 bucket HISTOGRAM with empty partCols (the
                    // global-median case) — its row count is
                    // span/2^shift buckets by the operator's own
                    // construction (Stats.scala), never row- or
                    // value-grain. Both are operator-structural, not
                    // per-query judgment calls.
                    a.name == "__cumsup" || a.name == "__b1"
                  case _ => false
                })) =>
            s"$name: Window(order=${w.orderSpec.map(_.sql).mkString(",")})"
        }
      }
    }
    assert(offenders.isEmpty,
      s"unpartitioned Window in contract plans (shard it or allowlist with a " +
        s"boundedness justification): ${offenders.mkString("; ")}")
  }

  test("q306 accuracy@1: no anchor-keyed exchange (votes/argmax ride the user join partitioning)") {
    // the r14 shuffle diet (277.5 -> 52.8 MB at x100): user_id leads both
    // grouping key sets so the post-join aggs are satisfied by the join's
    // hashpartitioning(user_id) via the subset rule, and the metric closes
    // by differencing against the 1-row anchor count instead of re-joining
    // anchors on anchor_id. Any exchange keyed on anchor_id alone means
    // the rank-window/metric-join shape crept back.
    val p = plan(EventQueries.nextCategoryAccuracy(spark, dir))
    assert(!p.contains("hashpartitioning(anchor_id"),
      s"anchor-keyed exchange in q306 plan:\n$p")
  }

  test("rrf fusion: final ranking touches candidate rows, no cartesian") {
    val p = plan(EventQueries.rrfFusion(spark, dir))
    assert(!p.contains("CartesianProduct"), s"cartesian in RRF plan:\n$p")
  }

  test("greedy coverage round: covered set anti-joined via BROADCAST (corpus never shuffles)") {
    // the q268 fix: a localCheckpoint'd covered set has no size stats,
    // and without the hint Spark sort-merges the anti-join — shuffling
    // the whole (doc, shingle) table every round (1.0 GB at 500k docs)
    val sh = graft.dedup.Dedup.shingles(
      graft.core.Tables.documents(spark, dir), "text", "doc_id", 3)
    val covered = sh.select(col("shingle")).limit(10).localCheckpoint(true)
    val p = plan(graft.queries.CurationQueries.coverageGain(sh, covered))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"covered-set anti-join must broadcast:\n$p")
  }

  test("mining bucket joins plan no cartesian (q270/q276/q277)") {
    val emb = graft.core.Tables.embeddings(spark, dir)
    Seq(
      graft.similarity.Similarity.mutualKnn(emb, "vec_id", "embedding"),
      graft.similarity.Similarity.semanticDecontam(emb, "vec_id", "embedding"))
      .foreach { df =>
        val p = plan(df)
        assert(!p.contains("CartesianProduct"),
          s"bucket join degenerated to cartesian:\n$p")
      }
  }

  test("dedup-by-source: survivor filter is a semi-join, source aggs map-side") {
    val p = plan(graft.queries.CurationQueries.dedupBySource(spark, dir))
    assert(p.contains("LeftSemi"), s"survivor filter must be a semi-join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("naive bayes: model attaches broadcast; argmin rank-limits map-side") {
    // the doc-key repartition inside the checkpoint pays off through
    // PARTIAL collapse (co-located docs), not exchange elimination —
    // the plan properties worth pinning: the class/vocab/weight model
    // tables must arrive via broadcast (never a sort-merge of the
    // fan-out), and the argmin must push a partial WindowGroupLimit
    // below its exchange (1 row per doc×class crosses the wire, not
    // the scored fan-out).
    val p = plan(graft.functions.TextClassify.nbConfusion(
      graft.core.Tables.documents(spark, dir), "text", "doc_id", "lang"))
    assert(!p.contains("SortMergeJoin"),
      s"model tables must broadcast onto the fan-out:\n$p")
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"argmin must rank-limit map-side before the window exchange:\n$p")
  }

  test("frequent triples: thresholded freqPairs semi-join is BROADCAST (pairs never shuffle)") {
    // The pair enumeration is the O(sum n_s^2) term; sort-merge-joining it
    // against the small thresholded freqPairs side would shuffle the FULL
    // enumeration. The checkpointed small sides carry no size stats, so the
    // explicit broadcast() hints are load-bearing — pin the shape.
    val p = plan(EventQueries.frequentTriples(spark, dir))
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(p).isDefined,
      s"freqPairs semi-join must be a broadcast semi-join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"pair enumeration must never sort-merge against the small sides:\n$p")
    assert(!p.contains("CartesianProduct"), s"triple join degenerated:\n$p")
  }

  test("streaming batch twins: dim enrich broadcasts, no sort-merge anywhere") {
    val p3 = plan(EventQueries.streamWindowCounts(spark, dir))
    assert(!p3.contains("SortMergeJoin") && !p3.contains("CartesianProduct"))
    val p5 = plan(EventQueries.streamEnrichedCounts(spark, dir))
    assert(p5.contains("BroadcastHashJoin"),
      s"the item-category dim must broadcast onto the stream scan:\n$p5")
    assert(!p5.contains("SortMergeJoin"), s"dim join degenerated to SMJ:\n$p5")
  }

  test("streaming batch twins: single scan — checkpointed projection feeds all consumers") {
    // each twin scans + parses events exactly ONCE (eager checkpoint);
    // dim / counts / watermark-max consumers read the RDD, never the
    // parquet (q305 un-checkpointed re-parsed the corpus JSON 3×, the
    // #1 wall line in BENCH_r11)
    for ((name, df) <- Seq(
        "q303" -> EventQueries.streamWindowCounts(spark, dir),
        "q304" -> EventQueries.streamClickAttribution(spark, dir),
        "q305" -> EventQueries.streamEnrichedCounts(spark, dir))) {
      val p = plan(df)
      val scans = "FileScan|Scan parquet".r.findAllIn(p).length
      assert(scans == 0,
        s"$name: expected 0 parquet scans (checkpointed projection), got $scans:\n$p")
      assert(p.contains("Scan ExistingRDD"),
        s"$name must read the checkpointed projection:\n$p")
    }
  }

  test("frame near-dup: fingerprint joins plan no cartesian, count joins broadcast") {
    val media = graft.multimodal.Multimodal.asMediaTable(
      graft.core.Tables.documents(spark, dir), "doc_id", "text")
    val p = plan(graft.multimodal.Multimodal
      .frameNearDupPairs(media, frameBytes = 32, maxDf = 20, k = 10))
    assert(!p.contains("CartesianProduct"), s"pair join degenerated:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the k-row top table must broadcast against the per-doc counts:\n$p")
  }
}
