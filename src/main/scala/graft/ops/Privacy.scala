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

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * leg of the release-gate trio: l-diversity still leaks when a QI
    * class's sensitive values are diverse but SKEWED relative to the
    * corpus (the skewness attack); t-closeness bounds, per class, the
    * Earth-Mover's Distance between the class's sensitive-value
    * distribution and the global one. For an ordered attribute EMD =
    * (1/(m−1))·Σᵥ|P̂ᵥ − Q̂ᵥ| over cumulative distributions; both
    * cumulatives are ppm-quantized (floor) BEFORE differencing, so
    * every intermediate stays ≤ 10⁶·m in int64 at ANY corpus size —
    * no N·n_c cross-product term to overflow, no guard needed.
    * Output (one row): n_classes, n_values, max_emd_ppm,
    * classes_above_t, rows_above_t_ppm at threshold `tPpm`.
    *
    * Scale shape: one agg to the (QI, value) grain, a zero-filled
    * (classes × values) grid off a broadcast value table, cumulatives
    * via a window PARTITIONED BY class over the value support — never
    * an unpartitioned window, never a fact-table window.
    */
  def tCloseness(
      df: DataFrame,
      qiCols: Seq[Column],
      sensitive: Column,
      tPpm: Long): DataFrame = {
    val named = df.select(
      qiCols.zipWithIndex.map { case (c, i) => c.as(s"__qi$i") } :+
        sensitive.as("__sv"): _*)
    val qi = qiCols.indices.map(i => col(s"__qi$i"))
    val qiNames = qiCols.indices.map(i => s"__qi$i")
    val cv = named.groupBy(qi :+ col("__sv"): _*).agg(count(lit(1)).as("pc"))
    val gv = cv.groupBy(col("__sv")).agg(sum(col("pc")).as("qc"))
    val tot = gv.agg(sum(col("qc")).as("n_total"), count(lit(1)).as("m_values"))
    val cls = cv.groupBy(qi: _*).agg(sum(col("pc")).as("nc"))
    val grid = cls
      .crossJoin(broadcast(gv))
      .join(cv, (qiNames :+ "__sv").toSeq, "left")
      .na.fill(0L, Seq("pc"))
      .crossJoin(broadcast(tot))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qi: _*)
      .orderBy(col("__sv"))
    val terms = grid
      .withColumn("pcum", sum(col("pc")).over(w))
      .withColumn("qcum", sum(col("qc")).over(w))
      .withColumn("term",
        abs(expr("pcum * 1000000 div nc - qcum * 1000000 div n_total")))
    val perClass = terms
      .groupBy(qi: _*)
      .agg(
        max(col("nc")).as("nc"), // constant per class; max = deterministic pick
        expr("sum(term) div greatest(max(m_values) - 1, 1L)").as("emd_ppm"))
    perClass
      .crossJoin(broadcast(tot))
      .agg(
        count(lit(1)).as("n_classes"),
        max(col("m_values")).as("n_values"),
        max(col("emd_ppm")).as("max_emd_ppm"),
        coalesce(sum(when(col("emd_ppm") > tPpm, lit(1L))), lit(0L))
          .as("classes_above_t"),
        coalesce(sum(when(col("emd_ppm") > tPpm, col("nc"))), lit(0L))
          .as("__rows_above"),
        max(col("n_total")).as("__n"))
      .select(
        col("n_classes"), col("n_values"), col("max_emd_ppm"),
        col("classes_above_t"),
        expr("__rows_above * 1000000 div __n").as("rows_above_t_ppm"))
  }
}
