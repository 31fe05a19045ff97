package graft.pipeline

import graft.core.Tables
import graft.ops.{Aggregates, Joins, Windows}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end reproduction of the reference workload's semantics
  * (GY-Bai/bigdata-retailrocket-recsys, `prepare_training_data_pyspark
  * .py:68-649` — SURVEY.md §0) over the driver's `events` table:
  * sessionize → item/category enrichment → anchor extraction →
  * 5-strategy candidate generation → feature assembly.
  *
  * Test-data mapping (the synthetic `events` stands in for
  * RetailRocket): `item_id` = the JSON `props.$.k` field,
  * `category_id` = item_id % 20 via a derived dimension (exercises the
  * J1 broadcast-enrich join exactly like the reference's 417K-row
  * item_category table), anchors (the reference's add-to-cart rows) =
  * `event_type = 'purchase'`.
  *
  * Plan shape at scale: ONE shuffle keyed by user for sessionization;
  * candidate strategies reuse the cached sessionized events; the
  * item_category dim is broadcast everywhere (reference J1); the
  * pair-generation self-join is capped + AQE-skew-handled
  * (SURVEY.md §7 risk item).
  */
object Pipeline {
  val SessionGapMinutes = 30
  val NumCategories = 20

  /** Pre-sessionize projection of the raw events (scan + JSON item
    * extraction only — no shuffle).
    */
  private def rawEvents(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        col("ts"),
        col("user_id"),
        col("event_type"),
        col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("item_id"))

  /** Sessionized, item-enriched event log:
    * (event_id, ts, epoch_s, user_id, event_type, value, item_id,
    * session_num, session_id).
    */
  def sessionizedEvents(spark: SparkSession, dir: String): DataFrame =
    Windows
      .sessionize(rawEvents(spark, dir), "user_id", "ts", "event_id", SessionGapMinutes)
      .select("event_id", "ts", "epoch_s", "user_id", "event_type", "value",
        "item_id", "session_num", "session_id")

  /** Derived item dimension (distinct items → category). Small ⇒
    * always broadcast at the join sites.
    */
  def itemCategory(events: DataFrame): DataFrame =
    events
      .select(col("item_id"))
      .distinct()
      .withColumn("category_id", pmod(col("item_id"), lit(NumCategories)).cast("long"))

  /** Item-projected raw events, NO sessionization: for queries that
    * only need (user, item, type, value) — popularity tables, negative
    * sampling — the session window's user-key exchange is pure waste
    * (10M-event probe of q291: 224.9 of its 224.9 MB shuffle was the
    * sessionize it never used). Null-item rows dropped, matching
    * [[enrichedEvents]]' inner dimension join.
    */
  def itemEvents(spark: SparkSession, dir: String): DataFrame =
    rawEvents(spark, dir).filter(col("item_id").isNotNull)

  /** Category-enriched sessionized events (J1 broadcast join). Cached:
    * every anchor/candidate/feature query fans out over this subtree
    * 2+ times, and Spark's CacheManager dedups identical plans, so one
    * .cache() here serves all call sites (reference caches the same
    * table, `prepare_training_data_pyspark.py:134`).
    */
  def enrichedEvents(spark: SparkSession, dir: String): DataFrame = {
    val se = sessionizedEvents(spark, dir)
    // derive the item dimension from the RAW projection, not the
    // sessionized stream — the distinct only needs item_id, and feeding
    // it `se` would run the sessionize shuffle+windows a second time
    // (nothing is cached yet at this point; measured ~40% of the
    // enriched-cache build)
    graft.core.Caches.cache(
      se.join(broadcast(itemCategory(rawEvents(spark, dir))), Seq("item_id"), "inner"))
  }

  /** Distinct (session_id, item_id) projection, cached — the
    * item-grain covis scaffold. Consumers that each built their own
    * copy (q111's capped cosine input, q112's covis neighbor table)
    * planned DIFFERENT subtrees for the same content, so the
    * sessionize+distinct exchange ran once per query; routing every
    * item-covis consumer through this ONE constructor makes the plans
    * identical and Spark's CacheManager serves them all from a single
    * InMemoryRelation within a scope.
    */
  def distinctSessionItems(spark: SparkSession, dir: String): DataFrame =
    graft.core.Caches.cache(
      sessionizedEvents(spark, dir)
        .select(col("session_id"), col("item_id"))
        .filter(col("item_id").isNotNull)
        .distinct())

  /** Anchors = purchase events with session + category context
    * (reference ATC extraction `:183-194`).
    */
  def anchors(enriched: DataFrame): DataFrame =
    enriched
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("anchor_id"),
        col("session_id"),
        col("user_id"),
        col("epoch_s").as("anchor_epoch_s"),
        col("item_id"),
        col("category_id"))

  /** Strategy 1 — session-prefix categories: distinct categories seen
    * strictly before the anchor within the same session (`:235-246`).
    */
  def prefixCandidates(anchors: DataFrame, enriched: DataFrame): DataFrame =
    anchors
      .select("anchor_id", "session_id", "anchor_epoch_s")
      .join(
        enriched.select(
          col("session_id"),
          col("epoch_s"),
          col("category_id")),
        Seq("session_id"))
      .filter(col("epoch_s") < col("anchor_epoch_s"))
      .select(col("anchor_id"), col("category_id"))
      .distinct()

  /** Strategy 2/3 — co-visitation: categories co-occurring with the
    * anchor's prefix categories across sessions (`:250-329`), top-k per
    * source category by pair count (deterministic tie-break).
    */
  def covisCandidates(
      anchors: DataFrame,
      enriched: DataFrame,
      minPairCount: Long,
      topK: Int): DataFrame =
    covisCandidatesFromPrefix(prefixCandidates(anchors, enriched), enriched, minPairCount, topK)

  /** [[covisCandidates]] with the (possibly cached) prefix-candidate
    * set passed in, so callers computing prefix candidates anyway don't
    * pay for the range-join subtree twice.
    */
  def covisCandidatesFromPrefix(
      prefixCands: DataFrame,
      enriched: DataFrame,
      minPairCount: Long,
      topK: Int): DataFrame =
    covisCandidatesFromDistinct(
      prefixCands,
      enriched.select(col("session_id"), col("category_id")).distinct(),
      minPairCount, topK)

  /** [[covisCandidatesFromPrefix]] over the already-distinct
    * (session_id, category_id) projection — the pipeline caches that
    * table once and derives covis pairs, category popularity, AND the
    * popularity top-N from it (distinct-session-count per category ==
    * row count per category of the distinct projection), replacing
    * three independent two-phase countDistinct aggregations over the
    * full event table with one distinct + trivial count aggs.
    */
  def covisCandidatesFromDistinct(
      prefixCands: DataFrame,
      di: DataFrame,
      minPairCount: Long,
      topK: Int): DataFrame = {
    // no size cap here: the item dimension is CATEGORIES (bounded ≤
    // NumCategories per session), so the cap's sizes+semi-join pass
    // would be two pure-overhead shuffles
    val directed = Joins.covisSymmetricDirected(
      di, "session_id", "category_id", minPairCount,
      maxGroupSize = None, alreadyDistinct = true)
    val top = Windows
      .topKPerGroup(directed, Seq("src"), col("pair_count"), Seq("dst"), topK)
      .drop("rn")
    // no distinct here: every caller unions strategies and dedups once
    prefixCands
      .withColumnRenamed("category_id", "src")
      .join(top, Seq("src"))
      .select(col("anchor_id"), col("dst").as("category_id"))
  }

  /** Strategy 4 — global popularity: every anchor × top-N categories by
    * distinct-session popularity (`:332-340`), broadcast cross join.
    */
  def popularityCandidates(anchors: DataFrame, enriched: DataFrame, topN: Int): DataFrame = {
    val top = enriched
      .groupBy(col("category_id"))
      .agg(countDistinct(col("session_id")).as("pop"))
      .orderBy(col("pop").desc, col("category_id").asc)
      .limit(topN)
      .select("category_id")
    Joins
      .crossWithTop(anchors.select("anchor_id"), top)
      .select("anchor_id", "category_id")
  }

  /** [[popularityCandidates]] from a precomputed per-category
    * distinct-session count (one row per category — broadcast-trivial).
    */
  def popularityFromCatPop(anchors: DataFrame, catPop: DataFrame, topN: Int): DataFrame = {
    val top = catPop
      .orderBy(col("cat_pop").desc, col("category_id").asc)
      .limit(topN)
      .select("category_id")
    Joins
      .crossWithTop(anchors.select("anchor_id"), top)
      .select("anchor_id", "category_id")
  }

  /** Strategy 5 — user history: top-k categories the user touched
    * strictly before the anchor, by recency (`:343-362`).
    */
  def userHistoryCandidates(anchors: DataFrame, enriched: DataFrame, topK: Int): DataFrame = {
    val lastSeen = enriched
      .groupBy(col("user_id"), col("category_id"))
      .agg(max(col("epoch_s")).as("last_seen"))
    val joined = anchors
      .select("anchor_id", "user_id", "anchor_epoch_s")
      .join(lastSeen, Seq("user_id"))
      .filter(col("last_seen") < col("anchor_epoch_s"))
    Windows
      .topKPerGroup(joined, Seq("anchor_id"), col("last_seen"), Seq("category_id"), topK)
      .select("anchor_id", "category_id")
  }

  /** All strategies unioned + dedup (`:365-370`). The prefix-candidate
    * subtree feeds both strategy 1 and the covis fan-out, so it is
    * cached once instead of planned twice. The RESULT is cached too
    * (as the reference does, `:381-382`): candidates feed both the
    * candidate query and feature assembly, and because this plan is
    * built deterministically from the same cached `enriched` instance,
    * Spark's CacheManager dedups the subtree across those consumers.
    */
  def candidatesFrom(a: DataFrame, enriched: DataFrame): DataFrame = {
    // eager, not lazy: the four strategy branches (and the covis
    // self-join's two references) all launch concurrently under the
    // final union's action and race past unmaterialized entries,
    // re-running the enriched/prefix subtrees per consumer (measured
    // on q116: 94 s task time / ~28 events-scans for a 6 s wall; one
    // scan each warm). Materializing prefixC populates the shared
    // enrichedEvents cache en route, so di's build reads it warm.
    val prefixC = graft.core.Caches.materialized(prefixCandidates(a, enriched))
    // one distinct (session, category) projection serves covis pairs
    // AND the popularity top-N (distinct-session count per category)
    val di = graft.core.Caches.materialized(
      enriched.select(col("session_id"), col("category_id")).distinct())
    val catPop = di.groupBy(col("category_id")).agg(count(lit(1)).as("cat_pop"))
    Seq(
      prefixC,
      covisCandidatesFromDistinct(prefixC, di, minPairCount = 2, topK = 10),
      popularityFromCatPop(a, catPop, topN = 5),
      userHistoryCandidates(a, enriched, topK = 10))
      .reduce(_ union _)
      .distinct()
      .transform(graft.core.Caches.cache)
  }

  def candidates(spark: SparkSession, dir: String): DataFrame = {
    val enriched = enrichedEvents(spark, dir)
    candidatesFrom(anchors(enriched), enriched)
  }

  /** Feature assembly (reference stage 6, `:441-632`): per
    * (anchor, candidate category) — prefix stats, popularity, user
    * affinity, session stats, time features, label.
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    val enriched = enrichedEvents(spark, dir)
    val a = anchors(enriched)

    // prefix rows (anchor × strictly-earlier same-session events) for
    // the prefix-stats aggregates (candidate generation has its own
    // narrower cached prefix subtree inside candidatesFrom).
    val prefix = a
      .select("anchor_id", "session_id", "anchor_epoch_s")
      .join(enriched.select(
        col("session_id"),
        col("epoch_s"),
        col("item_id"),
        col("category_id").as("pcat")), Seq("session_id"))
      .filter(col("epoch_s") < col("anchor_epoch_s"))
      // eager: prefixStats and prefixCatStats are sibling join branches
      // racing a lazy entry (round-8 rule; q26 measured 137 s task time
      // for an 8.5 s wall under lazy scaffolds)
      .transform(graft.core.Caches.materialized)

    // candidates through the SAME plan as the candidate query —
    // identical lineage from the shared cached `enriched`, so the
    // CacheManager serves one cached candidate set to both queries
    // (the reference likewise computes candidates once and feeds them
    // to feature assembly)
    val cand = candidatesFrom(a, enriched)

    // one distinct (user, session, category) projection: the user
    // level serves user-category affinity, its session-level reduction
    // the per-category popularity feature — replacing two two-phase
    // countDistinct aggregations over the full event table (session_id
    // determines user_id, so the session-level distinct of `du` equals
    // the distinct of enriched).
    val du = enriched
      .select(col("user_id"), col("session_id"), col("category_id"))
      .distinct()
      // eager: userCatAff and the catPop broadcast race a lazy entry
      .transform(graft.core.Caches.materialized)
    val di = du.select(col("session_id"), col("category_id")).distinct()
    val catPop = di.groupBy(col("category_id")).agg(count(lit(1)).as("cat_pop"))
    val base = cand
      .join(
        a.select(
          col("anchor_id"),
          col("session_id"),
          col("user_id"),
          col("anchor_epoch_s"),
          col("category_id").as("true_category")),
        Seq("anchor_id"))
    val prefixStats = prefix
      .groupBy(col("anchor_id"))
      .agg(
        countDistinct(col("item_id")).as("n_prefix_items"),
        count(lit(1)).as("n_prefix_events"),
        max(col("epoch_s")).as("last_prefix_epoch_s"))
    val prefixCatStats = prefix
      .groupBy(col("anchor_id"), col("pcat").as("category_id"))
      .agg(
        count(lit(1)).as("cat_count_in_prefix"),
        max(col("epoch_s")).as("cat_last_epoch_s"))

    // user-category affinity: distinct sessions of user touching cat
    val userCatAff = du
      .groupBy(col("user_id"), col("category_id"))
      .agg(count(lit(1)).as("user_cat_sessions"))

    // user session stats (two-level agg, reference A6 `:524-529`)
    val perSession = enriched
      .groupBy(col("user_id"), col("session_id"))
      .agg((max(col("epoch_s")) - min(col("epoch_s"))).as("session_dur_s"))
    val userStats = perSession
      .groupBy(col("user_id"))
      .agg(
        countDistinct(col("session_id")).as("user_n_sessions"),
        (sum(col("session_dur_s")).cast("double") / count(lit(1)))
          .as("user_avg_session_dur"))

    base
      .join(prefixStats, Seq("anchor_id"), "left")
      .join(prefixCatStats, Seq("anchor_id", "category_id"), "left")
      .join(broadcast(catPop), Seq("category_id"), "left")
      .join(userCatAff, Seq("user_id", "category_id"), "left")
      .join(userStats, Seq("user_id"), "left")
      .select(
        col("anchor_id"),
        col("category_id"),
        col("user_id"),
        col("session_id"),
        coalesce(col("n_prefix_items"), lit(0L)).as("n_prefix_items"),
        coalesce(col("n_prefix_events"), lit(0L)).as("n_prefix_events"),
        coalesce(col("cat_count_in_prefix"), lit(0L)).as("cat_count_in_prefix"),
        (coalesce(col("cat_count_in_prefix"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_prefix_events"), lit(0L)), lit(1L)))
          .as("cat_share_in_prefix"),
        coalesce(col("anchor_epoch_s") - col("cat_last_epoch_s"), lit(-1L))
          .as("recency_s"),
        coalesce(col("cat_pop"), lit(0L)).as("cat_pop"),
        round(log1p(coalesce(col("cat_pop"), lit(0L))), 6).as("log_cat_pop"),
        coalesce(col("user_cat_sessions"), lit(0L)).as("user_cat_sessions"),
        coalesce(col("user_n_sessions"), lit(0L)).as("user_n_sessions"),
        coalesce(col("user_avg_session_dur"), lit(0.0)).as("user_avg_session_dur"),
        hour(timestamp_seconds(col("anchor_epoch_s"))).cast("long").as("hour_of_day"),
        dayofweek(timestamp_seconds(col("anchor_epoch_s"))).cast("long").as("day_of_week"),
        when(dayofweek(timestamp_seconds(col("anchor_epoch_s"))).isin(1, 7), 1L)
          .otherwise(0L).as("is_weekend"),
        when(col("category_id") === col("true_category"), 1L).otherwise(0L).as("y"))
  }
}
