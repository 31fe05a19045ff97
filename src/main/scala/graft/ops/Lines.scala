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

  /** Corpus-wide PARAGRAPH dedup, first occurrence wins (the C4/Dolma
    * sub-document exact-dedup rule — [[stripBoilerplate]] drops lines by
    * FREQUENCY; this keeps exactly ONE copy of every duplicated
    * paragraph, owned by its earliest (doc, position)). Documents are
    * rebuilt from their surviving paragraphs in order; fully-duplicate
    * documents survive with empty text (dropping stays an explicit
    * downstream decision).
    *
    * Scale shape: one row-local posexplode on the separator; ownership
    * is row_number() == 1 over (paragraph fingerprint) ordered by
    * (doc, pos) — one exchange keyed by fingerprint whose hot keys cost
    * O(f) rows each (count/rank only, no pair blowup); the rebuild is
    * the struct-sorted collect_list on the doc key.
    */
  def paragraphDedup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      sep: String = "\n\n"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val paras = df
      .select(col(idCol), posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "para")))
      .filter(length(trim(col("para"))) > 0)
    val owned = paras.withColumn(
      "rn",
      row_number().over(
        Window.partitionBy(md5(col("para"))).orderBy(col(idCol), col("pos"))))
    val kept = owned
      .filter(col("rn") === 1)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_kept"),
        Aggregates.sortedStringAgg(Seq(col("pos")), col("para"), sep).as("text_dedup"))
    val totals = paras.groupBy(col(idCol)).agg(count(lit(1)).as("n_paras"))
    df.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(kept, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }
}
