package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audits over quasi-identifier (QI) columns — the
  * release-gate checks a training-data pipeline runs before shipping a
  * table that joins user attributes (Sweeney's k-anonymity, Machanavajjhala
  * et al.'s l-diversity). Companions to the PII-redaction operator
  * (q84): redaction removes direct identifiers; these measure how
  * re-identifiable the REMAINING attribute combination is.
  *
  * Scale shape: one hash aggregation to the QI-class grain (bounded by
  * the QI value-combination count, ≪ rows), then a one-row summary —
  * map-side combinable, no joins, no window over the fact table.
  */
object Privacy {

  /** k-anonymity audit: every row should be indistinguishable from at
    * least k−1 others on the QI columns. Output (one row):
    * n_classes, min_class_size, rows_below_k, rows_below_k_ppm —
    * rows_below_k is the population needing suppression/generalization
    * before release at threshold `k`.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[Column], k: Int): DataFrame =
    df.groupBy(qiCols: _*)
      .agg(count(lit(1)).as("sz"))
      .agg(
        count(lit(1)).as("n_classes"),
        min(col("sz")).as("min_class_size"),
        coalesce(sum(when(col("sz") < k, col("sz"))), lit(0L)).as("rows_below_k"),
        sum(col("sz")).as("__n_rows"))
      .select(
        col("n_classes"), col("min_class_size"), col("rows_below_k"),
        expr("rows_below_k * 1000000 div __n_rows").as("rows_below_k_ppm"))

  /** Distinct-l-diversity audit: within each QI class, the sensitive
    * attribute must take at least `l` distinct values, or membership in
    * the class discloses it (the homogeneity attack k-anonymity does
    * not prevent). Output (one row): n_classes, min_l,
    * classes_below_l, rows_below_l_ppm.
    */
  def lDiversity(
      df: DataFrame,
      qiCols: Seq[Column],
      sensitive: Column,
      l: Int): DataFrame =
    df.groupBy(qiCols: _*)
      .agg(
        count(lit(1)).as("sz"),
        countDistinct(sensitive).as("ldiv"))
      .agg(
        count(lit(1)).as("n_classes"),
        min(col("ldiv")).as("min_l"),
        coalesce(sum(when(col("ldiv") < l, lit(1L))), lit(0L)).as("classes_below_l"),
        coalesce(sum(when(col("ldiv") < l, col("sz"))), lit(0L)).as("__rows_below"),
        sum(col("sz")).as("__n_rows"))
      .select(
        col("n_classes"), col("min_l"), col("classes_below_l"),
        expr("__rows_below * 1000000 div __n_rows").as("rows_below_l_ppm"))
}
