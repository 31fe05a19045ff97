package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiler (the `ANALYZE`/`describe()` family,
  * schema-dynamic).
  *
  * For each requested column: non-null count, exact distinct count,
  * min and max (rendered as strings so heterogeneous column types fit
  * one output schema — the cast happens AFTER the typed min/max, so
  * numeric columns keep numeric ordering).
  *
  * Shape: two deterministic passes.
  *  - count/min/max: ONE aggregation over one scan, the wide single
  *    row unpivoted per-column with `stack` — no shuffle beyond the
  *    one-row reduce.
  *  - distinct counts: the columns are unpivoted to (column, value)
  *    rows FIRST, then ONE single-distinct aggregation keyed by
  *    column. Deliberately NOT `n × count_distinct` in one agg:
  *    Catalyst's multi-distinct rewrite (RewriteDistinctAggregates)
  *    assigns its Expand projections and `gid`s by hash-order of
  *    expression sets, so the SAME query text plans with permuted
  *    gids run-to-run — semantically equal but plan-text unstable,
  *    which broke the bench fingerprint (the only 2/306 unstable
  *    rows traced here). The unpivoted single-distinct form is
  *    plan-deterministic, carries the same row fan-out the rewrite's
  *    Expand would, and is the shape that swaps to
  *    `approx_count_distinct` (HLL, no fan-out) at 100 TB with an
  *    identical output contract.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.flatMap { c =>
      Seq(lit(c), col(s"${c}__nn"), col(s"${c}__min"), col(s"${c}__max"))
    }
    val base = wide.select(
      stack(
        Seq(lit(cols.length)) ++ stackArgs: _*
      ).as(Seq("column", "n_nonnull", "min_value", "max_value")))
    // distinct counts: unpivot, then one single-distinct agg. The
    // string cast is injective per column type (typed values render
    // distinctly), so counts match the typed count_distinct — EXCEPT
    // floating point: typed grouping normalizes -0.0 == 0.0 (and
    // collapses NaN payloads) while their string renders ('-0.0' vs
    // '0.0') stay distinct, so float/double columns add +0.0 first
    // (-0.0 + 0.0 = +0.0 in IEEE; NaN renders as one 'NaN' string
    // regardless of payload; float→double promotion is injective).
    val floatish: Set[String] = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.FloatType ||
        f.dataType == org.apache.spark.sql.types.DoubleType => f.name
    }.toSet
    val unpivotArgs = cols
      .map { c =>
        if (floatish(c)) s"'$c', cast((`$c` + 0.0d) as string)"
        else s"'$c', cast(`$c` as string)"
      }.mkString(", ")
    val nd = df
      .select(expr(s"stack(${cols.length}, $unpivotArgs) as (column, v)"))
      .filter(col("v").isNotNull)
      .groupBy(col("column"))
      .agg(count_distinct(col("v")).as("n_distinct"))
    base
      .join(broadcast(nd), Seq("column"), "left")
      .select(
        col("column"),
        col("n_nonnull"),
        // an all-null column has no unpivoted rows: distinct count 0
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"),
        col("max_value"))
  }

  /** Audit row for [[profile]]'s documented 100 TB swap: the profiler's
    * exact `count_distinct` becomes `approx_count_distinct` (HLL++, no
    * distinct fan-out, mergeable partials) at scale — this operator
    * runs BOTH on the same unpivoted pass and emits the exact count
    * plus a bounded-relative-error flag, the q297 sketch-audit pattern:
    * the approximate path's ERROR BOUND is the oracle-checkable
    * contract (the approximate value itself is engine-specific and is
    * deliberately not an output column).
    *
    * rsd 0.01 (2^14 registers) with a ±5% acceptance band = 5 standard
    * errors — deterministic data ⇒ deterministic estimate, and the
    * band is wide enough to hold for any dataset the driver generates.
    * One exchange: unpivot to (column, value) then a single-distinct
    * agg (the multi-distinct rewrite is plan-nondeterministic — see
    * [[profile]]).
    */
  def approxDistinctAudit(
      df: DataFrame, cols: Seq[String], sampleMod: Int = 1): DataFrame = {
    require(cols.nonEmpty, "approxDistinctAudit needs at least one column")
    require(sampleMod >= 1, "sampleMod must be >= 1")
    val unpivotArgs = cols
      .map(c => s"'$c', cast(`$c` as string)").mkString(", ")
    val all = df
      .select(expr(s"stack(${cols.length}, $unpivotArgs) as (column, v)"))
      .filter(col("v").isNotNull)
    // scale mode (the q279/q297 sampled-audit convention): audit a
    // deterministic 1/sampleMod VALUE subset — both agg sides see the
    // same hash-selected values, so the relative-error contract is
    // unchanged while the exact side's distinct exchange shrinks by
    // the mod. xxhash64, not md5: the selector runs per unpivoted row
    // at scan rate (measured 30M md5s ≈ the whole probe wall at 10M
    // events) and needs no cross-engine twin — the oracle contract
    // pins sampleMod=1 (full audit). Only meaningful for
    // high-cardinality columns: a low-cardinality column's few values
    // may all miss the subset (its group then vanishes from the audit).
    val unpivoted =
      if (sampleMod == 1) all
      else all.filter(pmod(xxhash64(col("v")), lit(sampleMod)) === 0)
    // exact and approx run as SEPARATE aggregations joined on the
    // cols-sized output — NOT one mixed agg: the distinct rewrite's
    // first phase groups by (column, v), and a regular agg riding along
    // allocates its partial buffer PER GROUP, i.e. one 2^14-register
    // HLL sketch per distinct value (~12 KB × |values|; measured 5+ s
    // and a bench head line at a 300k-value unpivot). Split, the HLL
    // buffers exist only per (column × partition) and each side is a
    // plain one-exchange agg over the re-derived scan-rate unpivot
    // (cheaper than caching it).
    val exact = unpivoted
      .groupBy(col("column"))
      .agg(count_distinct(col("v")).as("n_exact"))
    val approx = unpivoted
      .groupBy(col("column"))
      .agg(approx_count_distinct(col("v"), 0.01).as("__n_approx"))
    exact
      .join(broadcast(approx), Seq("column"))
      .select(
        col("column"),
        col("n_exact"),
        (abs(col("__n_approx") - col("n_exact")) * 100 <= col("n_exact") * 5)
          .as("within_5pct"))
  }

  /** Approximate-functional-dependency audit (the TANE/metanome
    * family's per-candidate check): how badly does `lhs → rhs` hold?
    * The g3-style error is the minimum fraction of rows to delete for
    * the FD to hold exactly — i.e. rows outside each lhs group's
    * MAJORITY rhs value (majority ties break to the smallest rhs —
    * determinism rule).
    *
    * Output (one row): fd name, n_rows, n_lhs groups, n_majority kept
    * rows, violation_ppm = (n_rows − n_majority)·10⁶ div n_rows.
    *
    * Shape: one map-side-combined exchange on (lhs, rhs), a window
    * over lhs on the collapsed group table (group-rate, not row-rate),
    * and a one-row reduce. Never touches raw rows after the first agg,
    * so it scales with the number of DISTINCT (lhs, rhs) combinations.
    */
  def fdViolations(df: DataFrame, fdName: String, lhs: String, rhs: String): DataFrame = {
    val groups = df
      .filter(col(lhs).isNotNull && col(rhs).isNotNull)
      .groupBy(col(lhs).as("l"), col(rhs).cast("string").as("r"))
      .agg(count(lit(1)).as("n"))
    val majority = graft.ops.Windows
      .topKPerGroup(groups, Seq("l"), col("n"), Seq("r"), 1)
    majority
      .join(
        groups.groupBy(col("l")).agg(sum(col("n")).as("n_l")),
        Seq("l"))
      .agg(
        sum(col("n_l")).as("n_rows"),
        count(lit(1)).as("n_lhs"),
        sum(col("n")).as("n_majority"))
      .select(
        lit(fdName).as("fd"),
        col("n_rows"),
        col("n_lhs"),
        col("n_majority"),
        expr("(n_rows - n_majority) * 1000000 div n_rows").as("violation_ppm"))
  }
}
