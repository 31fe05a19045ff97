package graft.functions

import graft.ops.Windows
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Term-weighting operators for training-data pipelines: TF-IDF top
  * terms per document and BM25 relevance scoring against a fixed query
  * term set.
  *
  * Cross-engine determinism: `ln` differs across libm implementations
  * at the ULP level, so every transcendental result is immediately
  * quantized to an integer micro score (`round(x*1e6)` as long) and all
  * RANKING and SUMMATION happens on those exact integers — a score_micro
  * ordering or long sum is bit-identical everywhere, while a raw-double
  * ordering could flip on ties.
  *
  * Scale notes: both operators are explode → two hash aggregations
  * (term frequencies, document frequencies) + broadcast of the tiny
  * term/corpus stats — the same map-side-combine shape as any word
  * count, no pairwise blowup, no driver loops (corpus size arrives via
  * a broadcast 1-row aggregate, not a driver `count()`).
  */
object TextRanking {

  /** Top-`k` terms per doc by smooth TF-IDF
    * (idf = ln((N+1)/(df+1)) + 1), deterministic tie-break on term.
    * Output: (doc_id, term, tf, score_micro, rn).
    */
  def tfidfTopTerms(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val toks = docs.select(
      col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn(
        "score_micro",
        round(
          col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)) *
            lit(1000000)).cast("long"))
    Windows
      .topKPerGroup(scored, Seq("doc_id"), col("score_micro"), Seq("term"), k)
      .select(col("doc_id"), col("term"), col("tf"), col("score_micro"), col("rn").cast("long").as("rn"))
  }

  /** Unigram-LM surprisal per document — the "perplexity filter"
    * primitive of LLM data pipelines (documents whose tokens are
    * improbable under the corpus language model are likely noise).
    * p(t) = corpus_count(t) / corpus_total; per-token surprisal is
    * quantized to micro-nats (round(−ln p × 1e6) — exact long), and the
    * doc score is the exact integer mean floor(Σ surprisal·tf / dl).
    * Output: (doc_id, dl, surprisal_micro).
    */
  def unigramSurprisal(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(
      col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val corpus = toks.groupBy(col("term")).agg(count(lit(1)).as("ct"))
    val total = toks.agg(count(lit(1)).as("total"))
    val perTerm = corpus
      .crossJoin(broadcast(total))
      .withColumn(
        "s_micro",
        round(-log(col("ct").cast("double") / col("total")) * lit(1000000)).cast("long"))
    tf.join(perTerm.select(col("term"), col("s_micro")), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("dl"),
        floor(sum(col("s_micro") * col("tf")).cast("double") / sum(col("tf")))
          .cast("long").as("surprisal_micro"))
  }

  /** BM25 (k1=1.2, b=0.75, Robertson idf = ln(1 + (N-df+0.5)/(df+0.5)))
    * of every document against a fixed `queryTerms` set. Per-term
    * contributions are quantized to micro units BEFORE the per-doc sum,
    * so the total is an exact long sum. Docs matching no term score 0.
    * Output: (doc_id, n_matched, score_micro).
    */
  def bm25Scores(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      queryTerms: Seq[String]): DataFrame = {
    val base = docs.select(
      col(idCol).as("doc_id"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("dl"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val toks = base.select(col("doc_id"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val contrib = tf
      .join(df, Seq("term"))
      .join(base.select(col("doc_id"), col("dl")), Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn(
        "contrib_micro",
        round(
          log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
            (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))) *
            lit(1000000)).cast("long"))
    val perDoc = contrib
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched"), sum(col("contrib_micro")).as("score_micro"))
    base
      .select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
  }

  /** Pointwise mutual information over within-doc term co-occurrence:
    * for term pairs sharing at least `minCoDocs` documents,
    * `pmi = ln(co_docs · N / (df_a · df_b))` with document-level
    * probabilities, emitted as an integer micro score (the module's
    * ln-quantization rule). The phrase-/collocation-mining primitive.
    *
    * Scale shape: the pair enumeration is [[graft.ops.Joins
    * .covisitationPairsDistinct]] over the (doc, term) postings with
    * the frequent-item prefilter ON — vocabulary is the textbook
    * long-tail dimension (hapax legomena dominate), so pruning terms
    * with df < minCoDocs shrinks the quadratic fan-out before it
    * happens, exactly the regime the opt-in prefilter exists for. Term
    * document-frequencies and the corpus size arrive via broadcast.
    */
  def pmiPairs(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      minCoDocs: Long): DataFrame = {
    val td = docs.select(
      col(idCol).as("doc_id"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("term"))
    val dfT = td.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = td.agg(countDistinct(col("doc_id")).as("n_docs"))
    graft.ops.Joins
      .covisitationPairsDistinct(
        td, "doc_id", "term",
        minCount = minCoDocs, maxGroupSize = None, frequentItemPrefilter = true)
      .select(col("item_a").as("term_a"), col("item_b").as("term_b"),
        col("pair_count").as("co_docs"))
      .join(broadcast(dfT.select(col("term").as("term_a"), col("df").as("df_a"))), Seq("term_a"))
      .join(broadcast(dfT.select(col("term").as("term_b"), col("df").as("df_b"))), Seq("term_b"))
      .crossJoin(broadcast(nDocs))
      .select(
        col("term_a"),
        col("term_b"),
        col("co_docs"),
        round(log(col("co_docs").cast("double") * col("n_docs") / (col("df_a") * col("df_b")))
          * 1000000).cast("long").as("pmi_micro"))
  }

  /** DSIR-style importance log-weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how much more likely its unigrams are under the
    * TARGET distribution (rows where `isTarget`) than under the RAW
    * corpus distribution — the data-selection primitive that upsamples
    * target-domain-looking text out of a crawl. Laplace-smoothed
    * document-level models over the shared vocabulary:
    * `lr(w) = ln( ((c_t(w)+1)/(N_t+V)) / ((c_r(w)+1)/(N_r+V)) )`,
    * micro-quantized per TERM (the module's ln rule), so each doc's
    * log-weight `Σ tf(w)·lr_micro(w)` is an exact long sum —
    * bit-deterministic ranking.
    *
    * Scale shape: one explode + the word-count aggregations (per-doc
    * tf, raw term counts, target term counts via conditional agg in the
    * SAME pass), a vocabulary-sized score table joined back onto tf by
    * term, one broadcast 1-row totals aggregate. No pairwise work; the
    * target side needs no second corpus scan.
    * Output: (doc_id, n_tokens, logweight_micro).
    */
  def dsirLogWeights(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      isTarget: Column): DataFrame = {
    val toks = docs.select(
      col(idCol).as("doc_id"),
      isTarget.cast("boolean").as("is_target"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val byTerm = toks.groupBy(col("term")).agg(
      count(lit(1)).as("c_r"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("c_t"))
    val totals = toks.agg(
      count(lit(1)).as("n_r"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("n_t"),
      countDistinct(col("term")).as("v"))
    val perTerm = byTerm
      .crossJoin(broadcast(totals))
      .select(
        col("term"),
        round(log(
          ((col("c_t") + lit(1L)).cast("double") / (col("n_t") + col("v"))) /
            ((col("c_r") + lit(1L)).cast("double") / (col("n_r") + col("v"))))
          * lit(1000000)).cast("long").as("lr_micro"))
    tf.join(perTerm, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("lr_micro")).as("logweight_micro"))
  }

  /** Held-out bigram-LM surprisal — the train/score split version of
    * [[unigramSurprisal]] (a KenLM-style quality filter shape): train a
    * Laplace-smoothed bigram model on even doc_ids, score odd doc_ids
    * with s(w1,w2) = −ln((c(w1,w2)+1) / (c(w1,·)+V)); unseen bigrams
    * and unseen heads degrade gracefully through the +1 / +V smoothing.
    * Per-bigram surprisal is micro-quantized BEFORE the per-doc sum
    * (the module's ln rule), so the doc score is an exact integer mean.
    *
    * Scale shape: bigram extraction is row-local (explode over token
    * index); model counts are two hash aggs; the score join shuffles by
    * (w1, w2) — word-count shape throughout. V and the head-count table
    * are vocabulary-sized; heads broadcast when small.
    * Output: (doc_id, n_bigrams, surprisal_micro) for scored docs with
    * ≥ 1 bigram.
    */
  def bigramSurprisal(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    def bigrams(d: DataFrame): DataFrame = d
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(
        col("doc_id"),
        col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
      .select(
        col("doc_id"),
        element_at(col("toks"), col("i")).as("w1"),
        element_at(col("toks"), col("i") + 1).as("w2"))
    val train = bigrams(docs.filter(col(idCol) % 2 === 0))
    val scoreSide = bigrams(docs.filter(col(idCol) % 2 === 1))
    val bg = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val heads = bg.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = train
      .select(explode(array(col("w1"), col("w2"))).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    scoreSide
      .join(bg, Seq("w1", "w2"), "left")
      .join(heads, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn(
        "s_micro",
        round(-log(
          (coalesce(col("c12"), lit(0L)).cast("double") + lit(1.0)) /
            (coalesce(col("c1"), lit(0L)).cast("double") + col("v").cast("double")))
          * lit(1000000)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        floor(sum(col("s_micro")).cast("double") / count(lit(1)))
          .cast("long").as("surprisal_micro"))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    * are maximal runs of content tokens between breakers (stopwords or
    * any non-purely-alphabetic token), capped at `maxPhraseLen` words;
    * each word scores deg/freq (deg = Σ phrase length over its
    * occurrences, freq = its occurrence count — favoring words that
    * live in LONG phrases), and a phrase scores the sum of its member
    * word scores. Pure integer: word scores are `deg·1e6 div freq`,
    * phrase scores exact sums of those — no floats anywhere, so the
    * oracle matches bit-for-bit. Two identical phrase strings are
    * always the same word multiset, so collapsing occurrences by
    * phrase text cannot merge different scores.
    *
    * Shape: one posexplode + ONE doc-partitioned window pass
    * (breaker-cumsum islands + per-island length — never an
    * unpartitioned window), a vocabulary-sized word-score agg, one
    * shuffle join back on the word, and a TakeOrderedAndProject cut.
    * Output: top-`k` `(phrase, n_words, n_occ, score_micro)` by
    * (score DESC, phrase ASC).
    */
  def rakeKeyphrases(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      stopwords: Seq[String],
      maxPhraseLen: Int,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(
        col(idCol).as("doc_id"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "tok")))
      .withColumn(
        "is_word",
        col("tok").rlike("^[a-z]+$") && !col("tok").isin(stopwords: _*))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val words = graft.core.Caches.cache(
      toks
        .withColumn("brk", when(col("is_word"), 0L).otherwise(1L))
        .withColumn("grp",
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("is_word"))
        .withColumn("phrase_len",
          count(lit(1)).over(Window.partitionBy(col("doc_id"), col("grp"))))
        .filter(col("phrase_len") <= maxPhraseLen)
        .select(col("doc_id"), col("grp"), col("pos"), col("tok"), col("phrase_len")))
    val scores = words
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("freq"), sum(col("phrase_len")).as("deg"))
      .select(col("tok"), expr("deg * 1000000 div freq").as("score_micro"))
    words
      .join(scores, Seq("tok"))
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        expr("array_join(transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok), ' ')")
          .as("phrase"),
        max(col("phrase_len")).as("n_words"),
        sum(col("score_micro")).as("psc"))
      .groupBy(col("phrase"))
      .agg(
        max(col("n_words")).as("n_words"),
        count(lit(1)).as("n_occ"),
        max(col("psc")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("phrase").asc)
      .limit(k)
  }
}
