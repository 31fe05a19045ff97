package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond plain equi-joins: point-in-time prefix
  * (range) joins, co-visitation self-joins, broadcast cross joins —
  * the reference's J3–J6 shapes (SURVEY.md §2.3; reference
  * `prepare_training_data_pyspark.py:236-240,252-257,339-340,349-353`).
  *
  * Scale notes:
  *  - Range joins here are EQUI-key + residual `<` predicate, so
  *    Catalyst plans a shuffled hash / sort-merge join on the equi key
  *    with the inequality as a post-join filter — never a cartesian.
  *  - Co-visitation is O(Σ n_g²) in group size; power-law groups skew.
  *    `covisitationPairs` takes `maxGroupSize` to cap quadratic blowup
  *    (drop pathological sessions) — the standard mitigation at scale,
  *    plus AQE skew-join splitting for what remains.
  *  - Small dimension sides should be wrapped in `broadcast()` by the
  *    caller; helpers below do it where the cardinality is known-small.
  */
object Joins {

  /** Point-in-time prefix join: for each anchor row, all detail rows
    * with the same `key` and `detail.tsCol < anchor.atCol` (strict
    * half-open prefix — no leakage of the anchor instant itself).
    *
    * Detail columns are selected via `detailCols` (renamed-as-given),
    * anchor keeps all its columns. Equi on `key` ⇒ shuffle/SMJ on key;
    * the `<` is a residual filter.
    */
  def prefixJoin(
      anchors: DataFrame,
      details: DataFrame,
      key: String,
      anchorTs: String,
      detailTs: String,
      detailCols: Seq[(String, String)]): DataFrame = {
    val d = details.select(
      (col(key) +: col(detailTs).as("__dts") +:
        detailCols.map { case (c, a) => col(c).as(a) }): _*)
    anchors
      .join(d, Seq(key), "inner")
      .filter(col("__dts") < col(anchorTs))
      .drop("__dts")
  }

  /** Left variant of [[prefixJoin]]: anchors with no prefix rows
    * survive with nulls (reference `:466-472`). The residual predicate
    * must live in the join condition (not a post-filter) to preserve
    * left-outer semantics.
    */
  def prefixJoinLeft(
      anchors: DataFrame,
      details: DataFrame,
      key: String,
      anchorTs: String,
      detailTs: String,
      detailCols: Seq[(String, String)]): DataFrame = {
    val d = details.select(
      (col(key).as("__k") +: col(detailTs).as("__dts") +:
        detailCols.map { case (c, a) => col(c).as(a) }): _*)
    anchors
      .join(d, anchors(key) === d("__k") && d("__dts") < anchors(anchorTs), "left")
      .drop("__k", "__dts")
  }

  /** Unordered co-visitation pairs within a group: for every group
    * (e.g. session) emit (item_a, item_b) with item_a < item_b for each
    * co-occurring distinct pair, counted across groups.
    *
    * `minCount` = HAVING threshold; `maxGroupSize` caps the quadratic
    * self-join by dropping groups with more than that many distinct
    * items (null = no cap). Returns (item_a, item_b, pair_count).
    */
  def covisitationPairs(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      minCount: Long = 1L,
      maxGroupSize: Option[Int] = Some(200),
      frequentItemPrefilter: Boolean = false,
      materialize: Boolean = true): DataFrame =
    covisitationPairsDistinct(
      df.select(col(groupCol), col(itemCol)).distinct(),
      groupCol, itemCol, minCount, maxGroupSize,
      frequentItemPrefilter = frequentItemPrefilter, materialize = materialize)

  /** [[covisitationPairs]] over an ALREADY-DISTINCT (group, item)
    * table. Callers that maintain the distinct projection anyway (the
    * pipeline caches it and derives popularity/affinity counts from the
    * same table) skip the built-in distinct pass.
    *
    * `materialize`: cache the multiply-referenced distinct projection
    * (default — right when the input lineage is expensive, e.g. a
    * sessionize window over raw parquet). Set FALSE when the input is
    * a table bucketed by `groupCol`: the scan is already co-located
    * and exchange-free, and Spark's cache over a non-finalized AQE
    * plan reports unknown partitioning, which would force the
    * session-key exchanges right back in (BucketingSpec pins both
    * shapes).
    */
  def covisitationPairsDistinct(
      distinctItems: DataFrame,
      groupCol: String,
      itemCol: String,
      minCount: Long = 1L,
      maxGroupSize: Option[Int] = Some(200),
      frequentItemPrefilter: Boolean = false,
      materialize: Boolean = true): DataFrame = {
    val capped = maxGroupSize match {
      case Some(cap) =>
        // Pre-aggregate group sizes; anti-join out oversized groups.
        // The cap path references distinctItems three times (sizes +
        // semi-join left + both pair sides downstream) — materialize so
        // the upstream distinct doesn't re-run per reference.
        val d = if (materialize) graft.core.Caches.cache(distinctItems) else distinctItems
        val sizes = d.groupBy(col(groupCol)).count()
        val keep = sizes.filter(col("count") <= cap).select(col(groupCol))
        d.join(keep, Seq(groupCol), "left_semi")
      case None =>
        // the prefilter references this subtree 3× (frequency + semi +
        // pair sides) — materialize so the upstream distinct runs once
        if (frequentItemPrefilter && minCount >= 2L && materialize)
          graft.core.Caches.cache(distinctItems)
        else distinctItems
    }
    // Lossless frequent-item prefilter: with distinct-group counting,
    // pair_count <= min(freq_a, freq_b), so an item present in fewer
    // than minCount groups cannot appear in ANY output pair — pruning
    // it is exact. OPT-IN (default off): it pays an item-frequency agg
    // + semi-join up front, which measured +15% on the dense synthetic
    // events at sf0.1 (q19 A/B 6.5 s vs 7.1–7.7 s — nothing prunes);
    // turn it ON for long-tail corpora where singletons dominate the
    // item dimension (the regime the quadratic fan-out actually hurts).
    // Applied after the cap so the cap's group sizes are unchanged.
    val pruned =
      if (frequentItemPrefilter && minCount >= 2L) {
        val freqOk = capped
          .groupBy(col(itemCol)).count()
          .filter(col("count") >= minCount)
          .select(col(itemCol))
        capped.join(freqOk, Seq(itemCol), "left_semi")
      } else capped
    val a = pruned.select(col(groupCol), col(itemCol).as("item_a"))
    val b = pruned.select(col(groupCol), col(itemCol).as("item_b"))
    a.join(b, Seq(groupCol), "inner")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
  }

  /** Symmetric directed closure of the co-visitation pair table:
    * compute the unordered pairs ONCE, cache them (the closure below
    * references the pair table twice — uncached, the quadratic covis
    * enumeration would run once per union side), and emit both
    * directions as `(src, dst, pair_count)`. One definition for what
    * was previously a seven-site hand-copied stanza across the eval /
    * diversity / fusion queries (the drift that let the r10 cache
    * defect survive to round 11).
    *
    * `alreadyDistinct` routes to [[covisitationPairsDistinct]] for
    * callers that maintain the distinct (group, item) projection
    * themselves (the pipeline's category candidates).
    */
  def covisSymmetricDirected(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      minCount: Long = 1L,
      maxGroupSize: Option[Int] = Some(200),
      alreadyDistinct: Boolean = false): DataFrame = {
    val pairs = graft.core.Caches.cache(
      if (alreadyDistinct)
        covisitationPairsDistinct(df, groupCol, itemCol, minCount, maxGroupSize)
      else covisitationPairs(df, groupCol, itemCol, minCount, maxGroupSize))
    pairs
      .select(col("item_a").as("src"), col("item_b").as("dst"), col("pair_count"))
      .unionByName(pairs
        .select(col("item_b").as("src"), col("item_a").as("dst"), col("pair_count")))
  }

  /** Co-visitation with RAW multiplicity semantics: `pair_count` =
    * Σ over groups of cnt_g(a)·cnt_g(b) — what enumerating all raw
    * event pairs counts (the reference's item co-visitation,
    * `prepare_training_data_pyspark.py:250-260`), but computed by
    * pre-aggregating per-group item counts FIRST so the quadratic
    * self-join runs over distinct (group, item) rows instead of raw
    * events. On repeat-heavy logs (the same item viewed many times per
    * session) this cuts the join's fan-out by the square of the repeat
    * factor while producing bit-identical counts.
    *
    * `maxGroupSize` caps groups by DISTINCT item count (the join-side
    * blowup driver). No frequent-item prefilter: under multiplicity
    * counting a single co-occurrence can carry weight ≥ minCount
    * (cnt·cnt), so frequency pruning would not be lossless.
    */
  def covisitationPairsWeighted(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      minCount: Long = 1L,
      maxGroupSize: Option[Int] = Some(200)): DataFrame = {
    // both pair sides scan this — materialize so the count agg runs once
    val counts = df
      .groupBy(col(groupCol), col(itemCol))
      .agg(count(lit(1)).as("__cnt"))
      .transform(graft.core.Caches.cache)
    val capped = maxGroupSize match {
      case Some(cap) =>
        val keep = counts.groupBy(col(groupCol)).count()
          .filter(col("count") <= cap).select(col(groupCol))
        counts.join(keep, Seq(groupCol), "left_semi")
      case None => counts
    }
    val a = capped.select(col(groupCol), col(itemCol).as("item_a"), col("__cnt").as("__ca"))
    val b = capped.select(col(groupCol), col(itemCol).as("item_b"), col("__cnt").as("__cb"))
    a.join(b, Seq(groupCol), "inner")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(sum(col("__ca") * col("__cb")).as("pair_count"))
      .filter(col("pair_count") >= minCount)
  }

  /** DIRECTED precedence pairs — the order-sensitive sibling of
    * [[covisitationPairsDistinct]] and the 2-sequence case of
    * sequential-pattern mining (PrefixSpan/SPAM's first level):
    * `(item_a, item_b, n_groups)` where item_a's FIRST occurrence
    * strictly precedes item_b's within the group, counted over groups.
    * Input is one row per (group, item) with `posCol` = the item's
    * first position in the group (unique within the group — ties are
    * impossible by construction when positions come from a
    * row_number). Unlike co-visitation, (a,b) and (b,a) are distinct
    * outcomes; unlike transitions, "precedes" is eventual, not
    * adjacent.
    *
    * Scale shape: identical to the covis self-join — group-keyed
    * equi-join over distinct (group, item) rows with the same
    * distinct-item group cap bounding the quadratic fan-out, one pair
    * exchange out. The support filter applies post-aggregation
    * (map-side combined).
    */
  def precedencePairs(
      firstPositions: DataFrame,
      groupCol: String,
      itemCol: String,
      posCol: String,
      minCount: Long,
      maxGroupSize: Option[Int] = Some(200)): DataFrame = {
    val capped = maxGroupSize match {
      case Some(cap) =>
        val d = graft.core.Caches.cache(firstPositions)
        val keep = d.groupBy(col(groupCol)).count()
          .filter(col("count") <= cap).select(col(groupCol))
        d.join(keep, Seq(groupCol), "left_semi")
      case None => firstPositions
    }
    val a = capped.select(col(groupCol), col(itemCol).as("item_a"), col(posCol).as("__pa"))
    val b = capped.select(col(groupCol), col(itemCol).as("item_b"), col(posCol).as("__pb"))
    a.join(b, Seq(groupCol))
      .filter(col("__pa") < col("__pb"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_groups"))
      .filter(col("n_groups") >= minCount)
  }

  /** AS-OF join: each left row picks the single LATEST right row with
    * `right.time ≤ left.time` (inclusive) sharing `keys` — the
    * point-in-time-correct feature attach ("most recent signal before
    * the anchor"), the nearest-match sibling of [[historyJoin]] (which
    * keeps ALL preceding rows). Left-outer semantics: no preceding
    * right row ⇒ nulls.
    *
    * Physical shape — the reason this exists as an operator: the naive
    * equi-join + `r.t ≤ l.t` residual + row_number-pick materializes
    * EVERY (anchor, preceding-row) pair before discarding all but one —
    * O(Σ matches) shuffle that grows with history depth. This instead
    * tags both sides, unions them, and runs ONE running-frame window
    * per key (`last(value, ignoreNulls)` over unbounded-preceding):
    * one hash exchange of |L|+|R| rows + a per-partition sort,
    * independent of history depth. Right rows sort BEFORE left rows at
    * equal times, so ties are inclusive (DuckDB `ASOF ... ON l.t >=
    * r.t` parity).
    *
    * Preconditions (documented, not checked): right is unique per
    * (keys, time) — pre-dedup latest-wins otherwise; right value
    * columns are non-null (the carry-forward would otherwise reach
    * past a genuine null to an older row); non-key column names are
    * disjoint across sides (alias first).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rVals = right.columns.toSeq.diff(keys)
    val collisions = lCols.toSet.intersect(rVals.toSet)
    require(collisions.isEmpty, s"asOfJoin column collision: $collisions")
    val lTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTimeCol).as("__t"), lit(1).as("__side")) ++
        lCols.diff(keys).map(col) ++
        rVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rTagged = right.select(
      keys.map(col) ++
        Seq(col(rightTimeCol).as("__t"), lit(0).as("__side")) ++
        lCols.diff(keys).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rVals.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val filled = rVals.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .filter(col("__side") === 1)
      .select(lCols.map(col) ++ rVals.map(col): _*)
  }

  /** Pure band join: every (l, r) pair with `|l.key − r.key| ≤ epsilon`
    * (inclusive, LONG keys, null keys never match) — the one join shape
    * Catalyst has no good plan for (no equi-key ⇒ BroadcastNestedLoop /
    * cartesian + filter, O(|L|·|R|)). Delegates to the engine's custom
    * range-partitioned sweep-merge physical operator
    * ([[org.apache.spark.sql.graft.BandJoinExec]]): one shuffle per
    * side, right rows replicated only across ε-straddled range cuts,
    * per-partition sorted sweep. Use for time-proximity joins with no
    * shared key (cross-entity coincidence windows); when an equi-key
    * EXISTS, prefer [[intervalJoin]] — equi-join + residual keeps AQE.
    * Sides must not share attribute IDs (alias a self-join first).
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeyCol: String,
      rightKeyCol: String,
      epsilon: Long): DataFrame =
    org.apache.spark.sql.graft.BandJoin(left, right, leftKeyCol, rightKeyCol, epsilon)

  /** Broadcast cross join of every anchor row with a global top-k
    * dimension (reference popularity candidates, `:339-340`).
    * `top` must be tiny (top-k) — forced broadcast nested-loop.
    */
  def crossWithTop(anchors: DataFrame, top: DataFrame): DataFrame =
    anchors.crossJoin(broadcast(top))

  /** As-of style user-history join: anchor ⋈ history on `key` where
    * `history.asOfCol < anchor.atCol` (reference `:349-353`).
    */
  def historyJoin(
      anchors: DataFrame,
      history: DataFrame,
      key: String,
      anchorTs: String,
      historyTs: String): DataFrame =
    anchors
      .join(history, Seq(key), "inner")
      .filter(col(historyTs) < col(anchorTs))

  /** Salted equi-join for skewed keys: the fact side gets a random salt
    * in [0, saltFactor); the dimension side is replicated saltFactor×
    * (explode) so every (key, salt) pair still matches. Spreads one hot
    * key over saltFactor reducers at the cost of dim replication — the
    * standard remedy when AQE skew-split isn't enough (e.g. a single
    * key larger than an executor). Join type inner/left only (salting
    * preserves both).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(joinType == "inner" || joinType == "left", s"unsupported join type $joinType")
    val salted = fact.withColumn("__salt", (rand(42) * saltFactor).cast("int"))
    val replicated = dim
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Left join + coalesce defaults for feature attachment
    * (reference J7 + F5, `:532-590`). `defaults` maps feature column →
    * default literal.
    */
  def leftJoinWithDefaults(
      base: DataFrame,
      features: DataFrame,
      keys: Seq[String],
      defaults: Map[String, Column]): DataFrame = {
    val joined = base.join(features, keys, "left")
    defaults.foldLeft(joined) { case (df, (c, d)) =>
      df.withColumn(c, coalesce(col(c), d))
    }
  }

  /** Interval-containment join: each probe row matches the interval
    * rows of the same `key` whose `[startCol, endCol]` contains its
    * `tsCol` (inclusive bounds). The attribution shape — assign a
    * late-arriving or separately-sourced event to the session /
    * campaign / visit window it fell into.
    *
    * Planned as an equi-join on `key` with the BETWEEN as a residual
    * filter — never a cartesian; the residual prunes within each key's
    * (small) interval set. For interval tables without a usable equi
    * key, bucketize time into fixed-width grid cells on both sides and
    * join on (key, cell) — not needed here since the key carries the
    * selectivity.
    */
  def intervalJoin(
      probes: DataFrame,
      intervals: DataFrame,
      key: String,
      tsCol: String,
      startCol: String,
      endCol: String): DataFrame =
    probes.join(
      intervals,
      probes(key) === intervals(key) &&
        probes(tsCol) >= intervals(startCol) &&
        probes(tsCol) <= intervals(endCol),
      "inner")
      .drop(intervals(key))

  /** Salted equi-join for skewed keys: identical row set to
    * `large.join(right, key)`, different physical distribution.
    *
    * A shuffle join sends every row of a key to ONE reducer — a key
    * holding 10% of a 100 TB fact table makes one straggler task own
    * 10 TB. Salting splits each key's rows across `nSalts` reducers:
    * the large side gets `salt = pmod(xxhash64(saltBy), nSalts)` (from
    * a caller-chosen DETERMINISTIC per-row column — never `rand()`,
    * which breaks retry/replay reproducibility), the small side is
    * replicated once per salt via a row-local `explode`, and the join
    * runs on `(key, salt)`. Replication costs `nSalts ×` the small
    * side — use for dimension-sized right sides under a genuinely
    * skewed fact; AQE's skew splitting handles milder cases without
    * the replication.
    */
  def saltedJoin(
      large: DataFrame,
      right: DataFrame,
      key: String,
      saltBy: Column,
      nSalts: Int): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    val salted = large.withColumn("__salt", pmod(xxhash64(saltBy), lit(nSalts.toLong)))
    val replicated = right.withColumn(
      "__salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1L))))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Frequent 3-itemsets (apriori step): extend frequent pairs to
    * triples by joining a third in-session item, count, threshold.
    * The apriori property makes the pruning LOSSLESS: every subset of
    * a frequent triple is frequent, so only items appearing in some
    * frequent pair can extend one — the third-item side is semi-joined
    * down before the enumeration join, which keeps the fan-out at
    * (frequent pairs × their sessions' pruned items), not sessions'
    * item³. Input must be a DISTINCT (group, item) table.
    *
    * Broadcast regime: the forced `broadcast()` hints below assume
    * `minCount` thresholds freqPairs to dimension scale (≲ a few
    * million rows — the intended support-mining regime, where the
    * threshold IS the point of apriori). On dense data with a
    * permissive threshold (the round-4 20M-candidate regime) freqPairs
    * can exceed broadcastable size; callers in that regime should raise
    * `minCount` (a triple cannot be frequent if its pairs barely are)
    * or gate on a cheap `freqPairs.count()` before calling, as the
    * other opt-in scale paths do. The hints stay because the
    * checkpoint erases the size stats Spark would need to make the
    * same call itself.
    */
  def frequentTriples(
      distinctItems: DataFrame,
      groupCol: String,
      itemCol: String,
      minCount: Long,
      maxGroupSize: Option[Int] = Some(200)): DataFrame = {
    val di = graft.core.Caches.cache(maxGroupSize match {
      case Some(cap) =>
        val keep = distinctItems.groupBy(col(groupCol)).count()
          .filter(col("count") <= cap).select(col(groupCol))
        distinctItems.join(keep, Seq(groupCol), "left_semi")
      case None => distinctItems
    })
    val pairs = di.as("a")
      .join(di.as("b"),
        col(s"a.$groupCol") === col(s"b.$groupCol") &&
          col(s"a.$itemCol") < col(s"b.$itemCol"))
      .select(
        col(s"a.$groupCol").as(groupCol),
        col(s"a.$itemCol").as("item_a"),
        col(s"b.$itemCol").as("item_b"))
    // Eager localCheckpoint, not lazy cache: freqPairs feeds 2+ exchanges
    // in the final action (the semi-join probe AND the frequentItems
    // union), and concurrent broadcast builds race past a lazy cache and
    // re-run its subtree per consumer. Checkpointing also erases size
    // stats, so both small sides below get explicit broadcast() hints —
    // without them Spark sort-merge-joins and shuffles the FULL pair
    // enumeration (the O(sum n_s^2) term) instead of pruning it map-side.
    val freqPairs =
      pairs.groupBy(col("item_a"), col("item_b"))
        .agg(count(lit(1)).as("pair_count"))
        .filter(col("pair_count") >= minCount)
        .localCheckpoint(true)
    // apriori prune: third items must participate in SOME frequent pair
    val frequentItems = freqPairs.select(col("item_a").as(itemCol))
      .unionByName(freqPairs.select(col("item_b").as(itemCol)))
      .distinct()
    val third = di.join(broadcast(frequentItems), Seq(itemCol), "left_semi")
    pairs
      .join(
        broadcast(freqPairs.select("item_a", "item_b")),
        Seq("item_a", "item_b"), "left_semi")
      .as("p")
      .join(third.as("c"),
        col(s"p.$groupCol") === col(s"c.$groupCol") &&
          col(s"c.$itemCol") > col("p.item_b"))
      .select(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"),
        col(s"c.$itemCol").as("item_c"))
      .groupBy(col("item_a"), col("item_b"), col("item_c"))
      .agg(count(lit(1)).as("triple_count"))
      .filter(col("triple_count") >= minCount)
  }

  /** MERGE/upsert: apply `updates` onto `base` by `keys` — matched rows
    * take the update's non-null column values (SCD type 1), unmatched
    * update rows are inserted, unmatched base rows pass through. The
    * lakehouse MERGE INTO re-expressed as one full-outer shuffle join;
    * at scale both sides hash-partition by the key once, and pre-
    * bucketed tables make it exchange-free (BucketingSpec pattern).
    * Columns = base's columns; updates may carry a subset (missing ones
    * keep the base value).
    *
    * PRECONDITION: `updates` must be unique per key tuple — duplicate
    * update keys would multiply matched base rows through the
    * full-outer join (standard MERGE raises on this; we require the
    * caller to guarantee it). When updates carry a version/timestamp,
    * pass it as `latestBy` and the latest row per key wins
    * (deduplicated with a window before the join — one extra exchange
    * on the same key, absorbed by the join's own partitioning).
    */
  def upsert(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      latestBy: Option[Column] = None): DataFrame = {
    val upd = latestBy match {
      case Some(ord) =>
        val w = Window.partitionBy(keys.map(col): _*).orderBy(ord.desc)
        updates.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      case None => updates
    }
    val valueCols = base.columns.filterNot(keys.contains)
    val updCols = upd.columns.toSet
    val cond = keys.map(k => col(s"b.$k") === col(s"u.$k")).reduce(_ && _)
    val merged = base.as("b").join(upd.as("u"), cond, "full_outer")
    val outCols = keys.map(k => coalesce(col(s"b.$k"), col(s"u.$k")).as(k)) ++
      valueCols.map { c =>
        if (updCols.contains(c)) coalesce(col(s"u.$c"), col(s"b.$c")).as(c)
        else col(s"b.$c").as(c)
      }
    merged.select(outCols: _*)
  }
}
