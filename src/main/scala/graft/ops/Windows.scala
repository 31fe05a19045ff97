package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators: sessionization (gap rule), per-group
  * top-k, latest-value-per-key.
  *
  * Mirrors the reference's W1–W3 (lag / running sum / row_number;
  * see reference `prepare_training_data_pyspark.py:96-131,171-173,
  * 280-287` — SURVEY.md §2.5) but with DETERMINISTIC orderings: every
  * window order includes a unique tie-break column, because
  * `row_number` over non-unique keys is non-deterministic under
  * re-partitioning (SURVEY.md §7 "What's hard").
  *
  * Scale notes: each window = one hash-partition exchange on the
  * partition keys + a sort within partitions. Chained windows over the
  * SAME partition keys reuse the exchange (Catalyst `EnsureRequirements`
  * sees the child's output partitioning), so `sessionize` costs exactly
  * one shuffle. Skewed partition keys (one user with millions of
  * events) are the risk at 100 TB — sessionization partitions by user,
  * which is naturally high-cardinality; AQE skew handling stays on.
  */
object Windows {

  /** Sessionize an event log with the N-minute-gap rule.
    *
    * Adds: `prev_epoch_s`, `gap_s`, `is_new_session`, `session_num`,
    * `session_id` (= "user_epoch-ordinal"). Single shuffle on
    * `userCol`; both windows share partitioning `(userCol)` and
    * ordering `(tsCol, tieCol)`.
    *
    * Gap is computed on floor-to-second epochs (`unix_timestamp`) so
    * results are reproducible across engines regardless of sub-second
    * timestamp precision.
    */
  def sessionize(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val gapS = gapMinutes * 60L
    events
      .withColumn("epoch_s", unix_timestamp(col(tsCol)))
      .withColumn("prev_epoch_s", lag(col("epoch_s"), 1).over(w))
      .withColumn("gap_s", col("epoch_s") - col("prev_epoch_s"))
      .withColumn(
        "is_new_session",
        when(col("prev_epoch_s").isNull || col("gap_s") > gapS, 1L).otherwise(0L))
      .withColumn("session_num", sum(col("is_new_session")).over(w))
      .withColumn(
        "session_id",
        concat(col(userCol).cast("string"), lit("_"), col("session_num").cast("string")))
  }

  /** Top-k rows per group by `orderCol` DESC, deterministic via
    * `tieCols` ASC appended to the window order. One exchange + sort.
    */
  def topKPerGroup(
      df: DataFrame,
      partCols: Seq[String],
      orderCol: Column,
      tieCols: Seq[String],
      k: Int): DataFrame = {
    val w = Window
      .partitionBy(partCols.map(col): _*)
      .orderBy(orderCol.desc +: tieCols.map(c => col(c).asc): _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Latest row per key: row_number()==1 over (keys / orderCol DESC,
    * ties broken by tieCols ASC). Reference "latest categoryid per
    * item" pattern (`prepare_training_data_pyspark.py:171-173`).
    */
  def latestPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: Column,
      tieCols: Seq[String]): DataFrame =
    topKPerGroup(df, keyCols, orderCol, tieCols, 1).drop("rn")

  /** First-order transition counts (Markov chain over in-group
    * sequences): for each group ordered by `orderCols`, pair every row's
    * `itemCol` with the NEXT row's, and count each (item_a, item_b)
    * transition across groups. The sequential-candidate matrix next to
    * the unordered [[graft.ops.Joins.covisitationPairs]].
    *
    * `orderCols` must end in a unique tie-break (the engine's
    * determinism rule — lead() over an ambiguous order is
    * plan-dependent). Scale shape: ONE shuffle to the group key for the
    * lead window, then a map-side-combined count on (item_a, item_b);
    * no self-join, output bounded by input rows (each row contributes
    * ≤1 transition) — strictly cheaper than pair enumeration.
    */
  def transitionCounts(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[Column],
      itemCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
    df.withColumn("__next", lead(col(itemCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(itemCol).as("item_a"), col("__next").as("item_b"))
      .agg(count(lit(1)).as("transition_count"))
  }

  /** Trailing range-frame aggregates: for each row, aggregate over all
    * rows of the same `partCol` whose numeric `orderCol` lies in
    * `[current - precedingRange, current]` — the moving-window shape
    * (7-day trailing spend, rolling event rate).
    *
    * RANGE (not ROWS) framing: the frame is defined by the ORDER VALUE
    * interval, so rows with equal `orderCol` share one frame and the
    * result needs NO tie-break to be deterministic — sum/count over a
    * value-defined set is order-free. One exchange + sort on the
    * partition key, same as every window here.
    */
  def trailingRangeAgg(
      df: DataFrame,
      partCol: String,
      orderCol: String,
      precedingRange: Long,
      aggs: Seq[(Column, String)]): DataFrame = {
    val w = Window
      .partitionBy(col(partCol))
      .orderBy(col(orderCol))
      .rangeBetween(-precedingRange, Window.currentRow)
    aggs.foldLeft(df) { case (acc, (a, name)) => acc.withColumn(name, a.over(w)) }
  }

  /** Run-length interval compression / SCD2 history build: collapse
    * consecutive equal values of `valueCol` per `keyCol` (ordered by
    * `orderCol` with unique `tieCol`) into
    * `(key, value, valid_from, valid_to)` intervals — `valid_from` =
    * the order value where the run starts, `valid_to` = the next run's
    * start (null while current). The dimension-history shape (type-2
    * slowly-changing attributes) and equally the RLE compressor for
    * state-change telemetry.
    *
    * ONE exchange: the change-detection lag and the interval-closing
    * lead share the `(key)` partitioning — the lead runs over the
    * FILTERED change rows, which preserve the partitioning and sort,
    * so Catalyst inserts no second exchange (pinned in WindowsSpec).
    */
  def scd2Intervals(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol), col(tieCol))
    df.select(col(keyCol), col(orderCol), col(tieCol), col(valueCol))
      // null-safe change test (null-valued runs are runs too — RLE must
      // be lossless), with an explicit first-row rule: lag()'s null is
      // ambiguous between "no previous row" and "previous value null"
      .withColumn(
        "__changed",
        row_number().over(w) === 1 || !(lag(col(valueCol), 1).over(w) <=> col(valueCol)))
      .filter(col("__changed"))
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("run_seq", row_number().over(w).cast("long"))
      .select(
        col(keyCol), col("run_seq"), col(valueCol), col("valid_from"), col("valid_to"))
  }

  /** GLOBAL running sums without a global single-partition window (the
    * scale antipattern): shard by a monotone bucket of the order key,
    * run per-shard windows, and add each shard's prefix offset (the sum
    * of strictly-earlier shard totals, computed on the shard-count-sized
    * totals table). `orderCol` must be unique (callers pre-aggregate to
    * one row per key). Emits `cum_<name>` per value column.
    */
  def shardedCumsum(
      df: DataFrame,
      orderCol: String,
      valueCols: Seq[String],
      shardExpr: Column): DataFrame =
    shardedCumsumBy(df, Nil, orderCol, valueCols, shardExpr)

  /** [[shardedCumsum]] generalized to per-partition running sums: the
    * cumulative order restarts at every distinct `partCols` tuple, and
    * WITHIN a partition the window is sharded by `shardExpr` (a
    * monotone bucket of `orderCol`) — so no single task ever holds a
    * partition's whole support, even when `partCols` has a handful of
    * distinct values over an unbounded per-partition domain (the
    * per-feature value-support shape). Offsets are computed on the
    * (partitions × shards)-sized totals table and broadcast back.
    * `orderCol` must be unique within each `partCols` group.
    */
  def shardedCumsumBy(
      df: DataFrame,
      partCols: Seq[String],
      orderCol: String,
      valueCols: Seq[String],
      shardExpr: Column): DataFrame = {
    // NOT cached here (measured r17): an operator-level cache of the
    // sharded support looks like it would dedupe the within/totals
    // double consumption, but the InMemoryRelation hides the input's
    // partitioning (the r4 cache rule) and re-introduces downstream
    // exchanges — q235 taskSum 3.3 → 28.1 s, tasks 41 → 614. Callers
    // whose INPUT subtree is expensive cache it at the call site,
    // below this operator's own exchanges (q124's deltas union).
    val sharded = df.withColumn("__shard", shardExpr)
    val w = Window
      .partitionBy((partCols :+ "__shard").map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = valueCols.foldLeft(sharded) { (d, c) =>
      d.withColumn(s"__w_$c", sum(col(c)).over(w))
    }
    val totals = sharded
      .groupBy((partCols :+ "__shard").map(col): _*)
      .agg(valueCols.map(c => sum(col(c)).as(s"__t_$c")).head,
        valueCols.map(c => sum(col(c)).as(s"__t_$c")).tail: _*)
    // Each shard's offset = sum of strictly-earlier shard totals in its
    // partition, as a TWO-LEVEL prefix sum over the shard-grain totals
    // table. Deliberately NOT a `b.__shard < a.__shard` triangle
    // self-join: with no equi-keys (partCols empty) that plans a
    // broadcast nested-loop QUADRATIC in shard count — measured 3.7 s
    // hot task at just 15k shards (q235's near-unique m_cents support),
    // and shard count tracks the value domain, so sparse domains blow
    // it up at scale. Level 1 runs per super-shard (partitioned window,
    // ≤ 65536 shard rows each); level 2's running sum over SUPER-shard
    // totals is the only empty-partition-spec window in the engine and
    // is ≤ shards/65536 rows by construction — PlanSpec's
    // unpartitioned-window lint recognizes it by the `__cumsup` order
    // column and this operator-level bound.
    // FLOOR division, not `div` (trunc-toward-zero): with a signed
    // shardExpr trunc-div's super-shard 0 would span −65535..65535 —
    // double the documented ≤65536 level-1 bound (ADVICE r13). pmod is
    // non-negative, so the subtraction lands on an exact multiple and
    // the quotient is the true floor; identical to `div` for shard ≥ 0.
    val tot2 = totals.withColumn("__cumsup",
      expr("(__shard - pmod(__shard, 65536L)) div 65536"))
    val w1 = Window
      .partitionBy((partCols :+ "__cumsup").map(col): _*)
      .orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withinOff = valueCols.foldLeft(tot2) { (d, c) =>
      d.withColumn(s"__wo_$c", sum(col(s"__t_$c")).over(w1))
    }
    val superTot = tot2
      .groupBy((partCols :+ "__cumsup").map(col): _*)
      .agg(valueCols.map(c => sum(col(s"__t_$c")).as(s"__s_$c")).head,
        valueCols.map(c => sum(col(s"__t_$c")).as(s"__s_$c")).tail: _*)
    val w2 = Window
      .partitionBy(partCols.map(col): _*)
      .orderBy(col("__cumsup"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val superOff = valueCols.foldLeft(superTot) { (d, c) =>
      d.withColumn(s"__so_$c", sum(col(s"__s_$c")).over(w2))
    }
    val offsets = withinOff
      .join(broadcast(superOff.drop(valueCols.map(c => s"__s_$c"): _*)),
        partCols :+ "__cumsup", "left")
      .select((partCols :+ "__shard").map(col) ++
        valueCols.map(c =>
          (coalesce(col(s"__wo_$c"), lit(0L)) +
            coalesce(col(s"__so_$c"), lit(0L))).as(s"__o_$c")): _*)
    val out = within.join(broadcast(offsets), partCols :+ "__shard", "left")
    valueCols
      .foldLeft(out) { (d, c) =>
        d.withColumn(s"cum_$c", col(s"__w_$c") + coalesce(col(s"__o_$c"), lit(0L)))
          .drop(s"__w_$c").drop(s"__o_$c")
      }
      .drop("__shard")
  }

  /** Last-observation-carried-forward (LOCF) imputation: fill nulls in
    * `valueCol` with the most recent non-null value within the key,
    * ordered by `orderCol` — `last(ignoreNulls)` over the running
    * frame, one exchange on the key. `orderCol` must be unique per key
    * (a dense grid day number, an event id) so the running frame is
    * well-defined; rows before the first observation stay null.
    */
  def locfFill(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      valueCol: String,
      filledName: String): DataFrame =
    df.withColumn(
      filledName,
      last(col(valueCol), ignoreNulls = true).over(
        Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
}
