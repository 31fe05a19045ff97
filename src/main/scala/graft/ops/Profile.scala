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
}
