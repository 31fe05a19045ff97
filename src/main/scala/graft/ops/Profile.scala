package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass table profiler (the `ANALYZE`/`describe()` family,
  * schema-dynamic).
  *
  * For each requested column: non-null count, exact distinct count,
  * min and max (rendered as strings so heterogeneous column types fit
  * one output schema — the cast happens AFTER the typed min/max, so
  * numeric columns keep numeric ordering).
  *
  * Shape: ONE aggregation over one scan — all columns' stats are
  * expressions of the same `agg`, and the wide single row is unpivoted
  * to per-column rows driver-side-free with `stack`. The multiple
  * exact `count(DISTINCT)`s expand the input once per profiled column
  * (Catalyst's Expand for multi-distinct); that is the cost of EXACT
  * profiling — at 100 TB swap `count_distinct` for
  * `approx_count_distinct` (HLL, one pass, no Expand) and keep the
  * identical output contract.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        count_distinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.flatMap { c =>
      Seq(lit(c), col(s"${c}__nn"), col(s"${c}__nd"), col(s"${c}__min"), col(s"${c}__max"))
    }
    wide.select(
      stack(
        Seq(lit(cols.length)) ++ stackArgs: _*
      ).as(Seq("column", "n_nonnull", "n_distinct", "min_value", "max_value")))
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
