package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level corpus operators.
  *
  * Web-crawl curation (CCNet / RefinedWeb style) removes BOILERPLATE at
  * the line level before any document-level dedup: navigation chrome,
  * cookie banners, copyright footers repeat verbatim across huge
  * numbers of pages, inflate n-gram overlap between unrelated
  * documents, and poison MinHash/Jaccard scores. The test is corpus
  * document frequency — a line that appears in ≥ `minDocs` distinct
  * documents is boilerplate; everything else is content.
  */
object Lines {

  /** Remove lines that occur in ≥ `minDocs` distinct documents,
    * preserving the original order of the surviving lines.
    *
    * Output: one row per input document —
    * `(idCol, n_lines_kept, n_lines_removed, clean_text)` — documents
    * whose every line is boilerplate survive with an empty
    * `clean_text`, so the operator never drops rows (dropping is a
    * separate, explicit filter decision).
    *
    * Scale shape (100 TB): one `posexplode` (row-local), one
    * line-frequency aggregation (map-side combinable `countDistinct`
    * — each doc contributes a line at most once per distinct value,
    * so partial aggregation collapses the per-doc repeats), and the
    * boilerplate set is BROADCAST back for an anti-join: by
    * construction it holds only lines shared by ≥ minDocs documents,
    * which is orders of magnitude smaller than the corpus (bounded by
    * total_lines / minDocs). The rebuild groups by the document key —
    * the same key the explode preserved — and sorts each doc's
    * surviving lines by position inside the aggregated array
    * (struct-sorted collect_list, the engine's determinism rule), not
    * with a per-group window.
    */
  def stripBoilerplate(
      df: DataFrame,
      textCol: String,
      idCol: String,
      minDocs: Long): DataFrame = {
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))

    val boilerplate = lines
      .groupBy(col("line"))
      .agg(count_distinct(col(idCol)).as("line_docs"))
      .filter(col("line_docs") >= minDocs)
      .select(col("line"))

    val kept = lines
      .join(broadcast(boilerplate), Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines_kept"),
        Aggregates.sortedStringAgg(Seq(col("pos")), col("line"), "\n").as("clean_text"))

    df.select(
        col(idCol),
        size(split(col(textCol), "\n")).cast("long").as("n_lines_total"))
      .join(kept, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        (col("n_lines_total") - coalesce(col("n_lines_kept"), lit(0L))).as("n_lines_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
