package graft

import graft.dedup.Dedup
import graft.functions.Pii
import graft.queries.{CurationQueries, EventQueries, RelationalQueries}
import org.apache.spark.sql.functions._

/** Round-5 curation-operator properties: losslessness of the prefix
  * filter, gap-fill density, set-op partitioning, PII redaction
  * fixtures, shard contiguity, mixture-rate enforcement, and the
  * composed curation pipeline's invariants.
  */
class CurationSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("prefix-filtered Jaccard == postings-list brute force at the same threshold") {
    val docs = graft.core.Tables.documents(spark, dir)
    val pref = Dedup
      .jaccardPrefixFilterPairs(docs, "text", "doc_id", n = 4, minJaccardPpm = 500000L)
      .orderBy(col("id_a"), col("id_b"))
    val brute = Dedup
      .ngramJaccardPairs(docs, "text", "doc_id", n = 4, minJaccardPpm = 500000L)
      .orderBy(col("id_a"), col("id_b"))
    assert(rows(pref) == rows(brute), "prefix filter dropped or invented a pair")
    assert(rows(pref).nonEmpty, "fixture corpus must contain near-dup pairs")
  }

  test("prefix filter indexes fewer postings than the full inverted index") {
    // the point of the filter: the prefix table is strictly smaller
    // than the full shingle table it replaces in the join
    val docs = graft.core.Tables.documents(spark, dir)
    val full = docs
      .select(explode(array_distinct(
        graft.functions.TextFunctions.wordShingles(col("text"), 4))).as("s"))
      .count()
    // mirror of the operator's internal prefix construction at τ=0.5:
    // per-doc prefix length L − ⌈τL⌉ + 1 ≈ L/2 + 1
    val sizes = docs.select(
      size(array_distinct(
        graft.functions.TextFunctions.wordShingles(col("text"), 4))).cast("long").as("sz"))
    val prefixTotal = sizes
      .select(sum(col("sz") - floor((col("sz") * 500000L + 999999L) / 1000000L) + 1L))
      .head().getLong(0)
    assert(prefixTotal < full, s"prefix total $prefixTotal not below full index $full")
  }

  test("gapfill emits one row per day in each user's span, conserving counts") {
    val out = EventQueries.dailyGapfill(spark, dir).cache()
    val spans = out
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_rows"),
        (max("day_num") - min("day_num") + 1).as("span"),
        sum("n_events").as("total"))
    val bad = spans.filter(col("n_rows") =!= col("span")).count()
    assert(bad == 0, "dense grid has holes or duplicates")
    val events = graft.core.Tables.events(spark, dir).count()
    val total = spans.agg(sum("total")).head().getLong(0)
    assert(total == events, "gap-filled counts must conserve the event count")
    assert(out.filter(col("n_events") === 0).count() > 0, "fixture should contain gaps")
    out.unpersist()
  }

  test("set-ops battery partitions F∪O custkeys into disjoint tags") {
    val out = RelationalQueries.setOps(spark, dir).cache()
    val perKey = out.groupBy("custkey").agg(count(lit(1)).as("n"))
    assert(perKey.filter(col("n") > 1).count() == 0, "a custkey appears under two tags")
    val o = graft.core.Tables.orders(spark, dir)
    val universe = o
      .filter(col("o_orderstatus").isin("F", "O"))
      .select(col("o_custkey")).distinct().count()
    assert(out.count() == universe, "tags must cover every F/O custkey exactly once")
    out.unpersist()
  }

  test("PII redaction on fixture strings") {
    import spark.implicits._
    val fixtures = Seq(
      "write to jane.doe+x@sub.example.co.uk today",
      "server 192.168.0.1 then call 555-0199",
      "no pii here at all",
      "a@b.io 1.2.3.4 123-4567 all three").toDF("t")
    val got = fixtures
      .select(
        Pii.redact(col("t")).as("r"),
        Pii.countEmails(col("t")).as("e"),
        Pii.countIps(col("t")).as("i"),
        Pii.countPhones(col("t")).as("p"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got(0) == (("write to [EMAIL] today", 1, 0, 0)))
    assert(got(1) == (("server [IP] then call [PHONE]", 0, 1, 1)))
    assert(got(2) == (("no pii here at all", 0, 0, 0)))
    assert(got(3) == (("[EMAIL] [IP] [PHONE] all three", 1, 1, 1)))
  }

  test("shuffle shards: positions are contiguous 1..n per shard; stable under repartition") {
    val out = CurationQueries.shuffleShards(spark, dir).cache()
    val perShard = out
      .groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
    assert(perShard.filter(col("lo") =!= 1L || col("hi") =!= col("n")).count() == 0,
      "pos must be a dense 1..n ranking within each shard")
    // determinism: the assignment is a pure function of doc_id
    val again = CurationQueries.shuffleShards(spark, dir)
    assert(rows(out.orderBy("doc_id")) == rows(again.orderBy("doc_id")))
    out.unpersist()
  }

  test("tokenBudgetCap: greedy longest-first prefix per group, budget-inclusive") {
    import spark.implicits._
    val docs = Seq(
      // group a: 60+50+40=150 fits, +35 would break at budget 150
      (1L, "a", 50L), (2L, "a", 60L), (3L, "a", 40L), (4L, "a", 35L),
      // group b independent: one oversized doc blocks everything after it
      (5L, "b", 200L), (6L, "b", 10L))
      .toDF("doc_id", "grp", "n_tokens")
    val out = graft.ops.Sampling
      .tokenBudgetCap(docs, "grp", col("n_tokens"), "doc_id", col("n_tokens"), 150L)
      .select("doc_id", "cum_tokens", "kept")
      .as[(Long, Long, Long)].collect()
      .map { case (id, cum, k) => id -> ((cum, k)) }.toMap
    assert(out(2L) == ((60L, 1L))) // longest first
    assert(out(1L) == ((110L, 1L)))
    assert(out(3L) == ((150L, 1L))) // budget-inclusive boundary
    assert(out(4L) == ((185L, 0L))) // first over-budget row dropped
    assert(out(5L) == ((200L, 0L))) // oversized head blocks its group
    assert(out(6L) == ((210L, 0L))) // greedy prefix: no backfill
  }

  test("temperatureMixSqrt: smallest source keeps all, larger flattened by sqrt, md5-stable") {
    import spark.implicits._
    // source a: 4 tokens total (smallest); b: 16 -> rate floor(1000*sqrt(4/16))=500
    val docs = Seq(
      (1L, "a", 4L),
      (10L, "b", 4L), (11L, "b", 4L), (12L, "b", 4L), (13L, "b", 4L))
      .toDF("doc_id", "src", "n_tokens")
    val out = graft.ops.Sampling
      .temperatureMixSqrt(docs, "src", col("n_tokens"), "doc_id")
      .select("doc_id", "keep_permille").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1000L, "smallest source must keep everything")
    // b-rows kept are exactly those whose md5 bucket < 500
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1000
    }
    val expectedB = Seq(10L, 11L, 12L, 13L).filter(bucket(_) < 500).toSet
    assert(out.keySet.filter(_ >= 10L) == expectedB)
    assert(expectedB.forall(out(_) == 500L))
    // partitioning-invariant
    val out2 = graft.ops.Sampling
      .temperatureMixSqrt(docs.repartition(7), "src", col("n_tokens"), "doc_id")
      .select("doc_id", "keep_permille").as[(Long, Long)].collect().toMap
    assert(out2 == out)
  }

  test("mixture sample keeps only rows under their stratum rate") {
    val out = CurationQueries.mixtureSample(spark, dir)
    assert(out.filter(col("bucket") >= col("rate_permille")).count() == 0)
    assert(out.select("rate_permille").distinct().count() > 1,
      "fixture must exercise more than one mixing rate")
  }

  test("zipf histogram conserves the corpus token count") {
    val docs = graft.core.Tables.documents(spark, dir)
    val nTokens = docs
      .select(sum(size(graft.functions.TextFunctions.tokens(col("text")))))
      .head().getLong(0)
    val hist = CurationQueries.zipfHistogram(spark, dir)
    assert(hist.agg(sum("total_occurrences")).head().getLong(0) == nTokens)
  }

  test("curation pipeline output respects every stage's invariant") {
    val out = CurationQueries.curationPipeline(spark, dir).cache()
    val ids = out.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
    assert(ids.forall(_ % 7 != 3), "benchmark stratum leaked into the training set")
    assert(out.filter(col("n_tokens") < 40).count() == 0, "length filter not applied")
    // survivor semantics: every retained doc is the min-id of its fp group
    val docs = graft.core.Tables.documents(spark, dir)
    val survivors = Dedup
      .exact(docs.filter(pmod(col("doc_id"), lit(7L)) =!= 3L), "text", "doc_id")
      .select(col("survivor_id"))
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    assert(ids.forall(survivors.contains), "a non-survivor duplicate was retained")
    out.unpersist()
  }

  test("gapfill plan contains no join (map-rebuild, not calendar-join)") {
    val p = EventQueries.dailyGapfill(spark, dir).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"gapfill should rebuild the grid row-locally:\n$p")
  }

  test("mixture sample plans zero exchanges (scan-side filter)") {
    val p = CurationQueries.mixtureSample(spark, dir)
      .queryExecution.executedPlan.toString
    // orderBy adds a range exchange for display; everything below it
    // must be exchange-free — no hashpartitioning anywhere
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("shuffle shards window is partitioned (no single-partition global window)") {
    val p = CurationQueries.shuffleShards(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window [") || !p.contains("windowspecdefinition()"),
      "window must be partitioned by shard")
    assert(p.contains("hashpartitioning(shard"), s"window should repartition by shard:\n$p")
  }

  test("line boilerplate: shared lines removed, content kept in order, no rows dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "HEADER\nalpha beta\ngamma\nFOOTER"),
      (2L, "HEADER\ndelta\nepsilon zeta\nFOOTER"),
      (3L, "HEADER\nFOOTER"), // all-boilerplate doc must survive, empty
      (4L, "solo line only")
    ).toDF("doc_id", "text")
    val out = graft.ops.Lines.stripBoilerplate(docs, "text", "doc_id", minDocs = 3L)
      .orderBy("doc_id").collect()
    assert(out.length == 4, "no input row may be dropped")
    assert(out(0).getString(3) == "alpha beta\ngamma")
    assert(out(1).getString(3) == "delta\nepsilon zeta")
    assert(out(2).getLong(1) == 0L && out(2).getString(3) == "")
    assert(out(2).getLong(2) == 2L, "both boilerplate lines counted as removed")
    assert(out(3).getString(3) == "solo line only", "unique lines untouched")
  }

  test("line boilerplate set is broadcast, not shuffled to the anti-join") {
    val p = CurationQueries.lineBoilerplate(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"boilerplate removal must be a broadcast anti-join:\n$p")
  }

  test("levenshtein pairs: finds planted typos, never compares across blocks") {
    import spark.implicits._
    val df = Seq("red widget", "rxd widget", "red gadget", "blue bolt")
      .toDF("name")
    val out = graft.ops.Fuzzy
      .levenshteinPairs(df, "name", element_at(split(col("name"), " "), 2), maxDist = 2)
      .collect()
    val pairs = out.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pairs == Set(("red widget", "rxd widget", 1L)),
      s"expected exactly the planted typo pair, got $pairs")
    // "red widget" vs "red gadget" is dist 2 but they share no noun
    // block ... they DO share nothing: widget vs gadget blocks differ.
    // "blue bolt" has no block partner at all.
  }

  test("fuzzy names query emits each planted variant paired with its original") {
    val out = rows(CurationQueries.fuzzyNames(spark, dir))
    assert(out.nonEmpty)
    // every planted 'x'-variant must appear in at least one pair with
    // distance 1 (its original differs in exactly the first char)
    val planted = out.filter(r =>
      (r.getString(0).startsWith("x") || r.getString(1).startsWith("x")) && r.getLong(2) == 1L)
    assert(planted.nonEmpty, "planted typo variants must be recovered")
  }

  test("NFC expression composes, is idempotent, and fast-paths normalized input") {
    import spark.implicits._
    val decomposed = "café naïve"
    val out = Seq(decomposed).toDF("t")
      .select(graft.functions.TextFunctions.normalizeNfc(col("t")).as("n"))
      .head().getString(0)
    assert(out == "café naïve", s"NFC must compose combining marks: $out")
    val again = Seq(out).toDF("t")
      .select(graft.functions.TextFunctions.normalizeNfc(col("t")).as("n"))
      .head().getString(0)
    assert(again == out, "NFC must be idempotent")
  }

  test("cleanText strips control chars but keeps tab and newline") {
    import spark.implicits._
    val dirty = "abc\td\ne"
    val out = Seq(dirty).toDF("t")
      .select(
        graft.functions.TextFunctions.cleanText(col("t")).as("c"),
        graft.functions.TextFunctions.controlCharCount(col("t")).as("n"))
      .head()
    assert(out.getString(0) == "ab c\td\ne".replace(" ", ""), s"got '${out.getString(0)}'")
    assert(out.getLong(1) == 3L, "BEL, ESC and DEL counted")
  }

  test("profile: one row per column, exact counts, typed min/max rendering") {
    import spark.implicits._
    val df = Seq((1L, "b", Some(10)), (2L, "a", None), (2L, "a", Some(3)))
      .toDF("k", "s", "v")
    val out = graft.ops.Profile.profile(df, Seq("k", "s", "v"))
      .orderBy("column").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("k", "s", "v"))
    val k = out(0); val s2 = out(1); val v = out(2)
    assert(k.getLong(1) == 3 && k.getLong(2) == 2 && k.getString(3) == "1" && k.getString(4) == "2")
    assert(s2.getLong(1) == 3 && s2.getLong(2) == 2 && s2.getString(3) == "a" && s2.getString(4) == "b")
    assert(v.getLong(1) == 2 && v.getLong(2) == 2 && v.getString(3) == "3" && v.getString(4) == "10",
      "min/max must use NUMERIC ordering before the string render")
  }

  test("profile plans two deterministic passes: no multi-distinct Expand, nd side broadcast") {
    val p = graft.ops.Profile
      .profile(graft.core.Tables.customer(spark, dir), Seq("c_custkey", "c_name"))
      .queryExecution.executedPlan.toString
    // exactly two scans: the count/min/max one-row agg and the
    // unpivoted single-distinct pass — NOT one scan per column
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 2, s"profiler must scan once per pass, not per column:\n$p")
    // the deterministic-plan property: Catalyst's multi-distinct
    // rewrite (hash-ordered Expand + gids, plan-text unstable
    // run-to-run) must never appear — distinct counts come from the
    // unpivoted single-distinct aggregation instead
    assert(!p.contains("Expand"),
      s"multi-distinct Expand crept back into the profiler:\n$p")
    // the per-column stats table is column-count-sized: broadcast join
    assert(p.contains("BroadcastHashJoin"),
      s"nd attach must broadcast, not shuffle:\n$p")
  }
}
