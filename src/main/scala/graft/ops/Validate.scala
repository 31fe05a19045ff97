package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the dbt-test / Deequ family):
  * each constraint yields its VIOLATION rows (debuggable — the rows
  * themselves, not just a boolean), and [[report]] folds any set of
  * named checks into one `(constraint, n_violations)` summary.
  *
  * Every check is a single scan-side filter or one aggregation —
  * nothing collects to the driver, so the battery runs at fact-table
  * scale: a 100 TB ingest gate is these same expressions over the
  * day's partition. Violation counts are exact; for a cheaper
  * continuous monitor, swap the count for a sampled `limit(k)` of
  * offending rows.
  */
object Validate {

  /** Rows where `c` is null. */
  def notNullViolations(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNull)

  /** One row per duplicated key tuple, with its multiplicity. */
  def uniqueKeyViolations(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("multiplicity"))
      .filter(col("multiplicity") > 1L)

  /** Child rows whose non-null `fk` has no match in `parent.pk`
    * (broadcast the parent key set when dimension-sized; Catalyst
    * decides — the anti-join is the scalable form either way).
    */
  def refIntegrityViolations(
      child: DataFrame,
      fk: String,
      parent: DataFrame,
      pk: String): DataFrame =
    child
      .filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")

  /** Rows outside `[lo, hi]` (nulls are not range violations — pair
    * with [[notNullViolations]] to forbid them).
    */
  def rangeViolations(df: DataFrame, c: String, lo: Long, hi: Long): DataFrame =
    df.filter(col(c).isNotNull && (col(c) < lo || col(c) > hi))

  /** Rows whose `c` is outside the accepted value set. */
  def acceptedValuesViolations(df: DataFrame, c: String, values: Seq[String]): DataFrame =
    df.filter(col(c).isNotNull && !col(c).isin(values: _*))

  /** Fold named checks into `(constraint, n_violations)` — one count
    * aggregation per check, unioned; deterministic output order is the
    * caller's `orderBy`.
    */
  def report(checks: Seq[(String, DataFrame)]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    checks
      .map { case (name, viol) =>
        viol.agg(count(lit(1)).as("n_violations"))
          .select(lit(name).as("constraint"), col("n_violations"))
      }
      .reduce(_.unionByName(_))
  }
}
