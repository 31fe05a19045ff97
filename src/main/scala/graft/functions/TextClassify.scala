package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed multinomial Naive Bayes over a token column — the
  * classic "quality / domain classifier" primitive of LLM-corpus
  * curation (a fastText-style linear bag-of-words scorer is the same
  * shape: per-token class weights summed per document).
  *
  * Reference analogue: the reference pipeline stops at Word2Vec
  * features (`prepare_training_data_pyspark.py:409-433`); a corpus
  * curation stack needs the classifier head too, so this implements
  * the canonical count-based one.
  *
  * Determinism contract: per-(class, token) weights are NEGATIVE log
  * likelihoods quantized to integer micro-nats (`round(-ln p × 1e6)` —
  * the TextRanking pattern), all per-document summation happens on
  * those exact longs, and argmin ties break on class name ASC. The
  * class PRIOR is deliberately uniform, so token evidence alone drives
  * the prediction (with near-identical class priors a prior term only
  * adds a constant; with skewed ones it would drown the audit signal).
  *
  * Scale shape (100 TB): token counting is one map-side-combined
  * exchange on (doc, term); the model — (class × vocab) weight rows —
  * is aggregated from the same counts and BROADCAST to the scoring
  * join (a trained classifier is small relative to the corpus;
  * `broadcastModel = false` drops the hint so a vocabulary past the
  * broadcast ceiling degrades to a shuffle join on the (class, term)
  * key instead of failing the hint). Per-document scores reduce in
  * one exchange on the doc key; the confusion matrix is a final tiny
  * aggregate. No driver-side loops, no per-row UDFs — every step is
  * codegen'd built-ins.
  */
object TextClassify {

  /** Train-and-score multinomial NB (Laplace +1 smoothing) on the
    * corpus itself and return the label × predicted-label confusion
    * matrix — the in-corpus separability audit ("how much do my
    * declared languages/sources actually differ in token
    * distribution?").
    *
    * Output: (label, pred_label, n_docs) ordered by (label, pred).
    */
  def nbConfusion(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      labelCol: String,
      broadcastModel: Boolean = true): DataFrame = {
    def side(df: DataFrame): DataFrame = if (broadcastModel) broadcast(df) else df
    // (doc, label, term) -> tf; one exchange, partials combine map-side.
    // Eagerly materialized: tf feeds THREE broadcast subtrees (cls,
    // vocab, w) plus the scoring path — broadcasts build on concurrent
    // threads and race past a lazy cache (the q227 lesson), so
    // localCheckpoint, not Caches.cache.
    //
    // Repartition on doc_id BEFORE the checkpoint: the checkpointed RDD
    // loses its partitioning METADATA (AQE plan -> unknown, the round-4
    // cache rule), so downstream exchanges still appear — but the rows
    // are physically doc-co-located, so the scoring aggregate's PARTIAL
    // pass collapses each doc's ×|classes| fan-out to |classes| rows
    // and the argmin window's partial WindowGroupLimit cuts to 1 row
    // per (doc, class) BEFORE either exchange. The exchanges survive;
    // their payload doesn't (500k-doc probe: 911.8 → 498.8 MB, −32%
    // wall — see DESIGN.md).
    val tfC = docs
      .select(
        col(idCol).as("doc_id"),
        col(labelCol).as("label"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("label"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .repartition(col("doc_id"))
      .localCheckpoint(true)

    // Model: per-class token totals, vocabulary size, per-class mass.
    val cls = tfC.groupBy(col("label").as("c")).agg(sum(col("tf")).as("tot"))
    val vocab = tfC.agg(countDistinct(col("term")).as("v"))

    // nll_micro(c, t) = round(-ln((cnt+1)/(tot+v)) * 1e6): positive
    // micro-nats (negation BEFORE rounding — the surprisal precedent,
    // so both engines round a positive value).
    val w = tfC
      .groupBy(col("label").as("c"), col("term"))
      .agg(sum(col("tf")).as("cnt"))
      .join(broadcast(cls), "c")
      .crossJoin(broadcast(vocab))
      .select(
        col("c"),
        col("term"),
        round(-log((col("cnt") + lit(1.0)) / (col("tot") + col("v"))) * lit(1000000L))
          .cast("long").as("nll_micro"))

    // Unseen-token penalty per class: count 0 under the same smoothing.
    val w0 = cls
      .crossJoin(vocab)
      .select(
        col("c"),
        round(-log(lit(1.0) / (col("tot") + col("v"))) * lit(1000000L))
          .cast("long").as("nll0_micro"))

    // Score every doc against every class: fan out by the (small) class
    // list, attach weights, reduce on the doc key.
    val scored = tfC
      .crossJoin(broadcast(w0))
      .join(side(w), Seq("c", "term"), "left")
      .groupBy(col("doc_id"), col("label"), col("c"))
      .agg(sum(col("tf") * coalesce(col("nll_micro"), col("nll0_micro"))).as("nll"))

    val pred = scored
      .withColumn(
        "rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id"))
            .orderBy(col("nll").asc, col("c").asc)))
      .filter(col("rn") === 1)

    pred
      .groupBy(col("label"), col("c").as("pred_label"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
