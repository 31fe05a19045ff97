package graft.functions

import graft.core.Caches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-TRAINING primitive of every LLM data pipeline: iteratively
  * find the most frequent adjacent symbol pair in the corpus vocabulary
  * and fuse it into a new symbol.
  *
  * Determinism contract: pair counts are exact long sums weighted by
  * word frequency; the winning merge breaks count ties on (a, b)
  * lexicographically; the in-word merge applies LEFT-TO-RIGHT
  * NON-OVERLAPPING via plain string `replace` — identical greedy
  * semantics in Spark and any SQL engine, so a fixed round count is
  * bit-identical everywhere.
  *
  * Sequence encoding: symbols are joined by TWO spaces and the string
  * is wrapped in single spaces (`" a  b  c "`); the merge pattern
  * `" a  b "` carries one flanking space on each side. A naive
  * single-space encoding is WRONG twice over: a pattern can match a
  * symbol's suffix (`"xa b"` contains `"a b"`), and each replacement
  * consumes the boundary space the NEXT adjacent match needs (so
  * `"a b a b"` merges once instead of twice). With doubled separators
  * the flanking single space only ever precedes a symbol START, and a
  * match consumes one of the two separator spaces — the leftover space
  * re-flanks the following match, preserving the encoding invariant
  * through consecutive rewrites.
  *
  * Scale shape per round: symbol-pair extraction and counting run over
  * the VOCABULARY table (distinct words × frequency — the classic BPE
  * trick: corpus size only enters through the one word-count
  * aggregation up front), the argmax is a driver-side 1-row top-k
  * (TakeOrderedAndProject), broadcast back for the row-local merge
  * rewrite. Each round's sequence table is cached so round r+1 rewrites
  * materialized sequences, not an r-deep replace chain.
  */
object Bpe {

  /** Learn `rounds` BPE merges over whitespace tokens of `textCol`.
    * Output: one row per round, `(round, pair_a, pair_b, merged,
    * pair_count)` — the merge table a tokenizer would persist.
    */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("wc"))
    var seqs = Caches.cache(
      words.select(
        col("wc"),
        concat(lit(" "), concat_ws("  ", split(col("w"), "")), lit(" ")).as("seq")))
    val merges = (1 to rounds).map { r =>
      val pairs = seqs
        .select(col("wc"), split(trim(col("seq")), "  ").as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("wc"), col("s"), explode(sequence(lit(1), size(col("s")) - 1)).as("i"))
        .select(
          col("wc"),
          element_at(col("s"), col("i")).as("a"),
          element_at(col("s"), col("i") + 1).as("b"))
        .groupBy(col("a"), col("b"))
        .agg(sum(col("wc")).as("pair_count"))
      val best = pairs
        .orderBy(col("pair_count").desc, col("a").asc, col("b").asc)
        .limit(1)
      seqs = Caches.cache(
        seqs.crossJoin(broadcast(best.select(col("a"), col("b"))))
          .select(
            col("wc"),
            expr("replace(seq, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ')")
              .as("seq")))
      best.select(
        lit(r.toLong).as("round"),
        col("a").as("pair_a"),
        col("b").as("pair_b"),
        concat(col("a"), col("b")).as("merged"),
        col("pair_count"))
    }
    merges.reduce(_.unionByName(_))
  }

  /** Learn `rounds` merges AND return the ENCODED vocabulary — the
    * tokenizer-APPLICATION half of BPE that [[learnMerges]] trains:
    * `(w, wc, n_symbols)` where n_symbols is the word's subword count
    * after all merges. Same loop, same double-separator rewrite, the
    * word key carried through so callers can join the encoding back to
    * the corpus (the classic BPE trick: the corpus only enters through
    * the word-count aggregation — everything after runs at VOCABULARY
    * rate, and applying the tokenizer to 100 TB is a token-rate join
    * against this table).
    */
  def encodeVocab(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("wc"))
    var seqs = Caches.cache(
      words.select(
        col("w"),
        col("wc"),
        concat(lit(" "), concat_ws("  ", split(col("w"), "")), lit(" ")).as("seq")))
    for (_ <- 1 to rounds) {
      val pairs = seqs
        .select(col("wc"), split(trim(col("seq")), "  ").as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("wc"), col("s"), explode(sequence(lit(1), size(col("s")) - 1)).as("i"))
        .select(
          col("wc"),
          element_at(col("s"), col("i")).as("a"),
          element_at(col("s"), col("i") + 1).as("b"))
        .groupBy(col("a"), col("b"))
        .agg(sum(col("wc")).as("pair_count"))
      val best = pairs
        .orderBy(col("pair_count").desc, col("a").asc, col("b").asc)
        .limit(1)
      seqs = Caches.cache(
        seqs.crossJoin(broadcast(best.select(col("a"), col("b"))))
          .select(
            col("w"),
            col("wc"),
            expr("replace(seq, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ')")
              .as("seq")))
    }
    seqs.select(
      col("w"),
      col("wc"),
      size(split(trim(col("seq")), "  ")).cast("long").as("n_symbols"))
  }
}
