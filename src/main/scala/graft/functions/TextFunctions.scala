package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines: tokenization, language ID, quality scoring, token
  * counting, document fingerprinting.
  *
  * Everything here is pure `org.apache.spark.sql.functions` — codegen'd
  * expressions, no UDFs — so whole-stage codegen keeps the scan→score
  * pipeline in one fused stage, and all results are integer/string
  * exact (cross-engine reproducible; doubles only appear as ratios of
  * exact integers).
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text (regex `\s+`). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Occurrences of literal substring `needle` via length arithmetic —
    * exact and identical in any engine with `replace`/`length`.
    */
  def substrCount(text: Column, needle: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(needle), ""))) /
      needle.length).cast("long")

  /** Word n-gram shingles (space-joined) from whitespace tokens.
    * For i in [0, numTokens-n]: tokens[i..i+n) joined by one space.
    * Native one-pass expression (WordShingles scaladoc): the composed
    * HOF form re-ran `split` per output element, dominating the dedup
    * queries' runtime.
    */
  def wordShingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.WordShingles(text, n)

  /** One-pass row-local repetition stats:
    * struct(n_tokens, n_distinct_tokens, top_ngram_count). See
    * org.apache.spark.sql.graft.RepetitionStats — keeps per-doc
    * statistics scan-side instead of exploding n-grams into a shuffle.
    */
  def repetitionStats(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.RepetitionStats(text, n)

  /** Language score for a candidate language = total occurrences of its
    * marker words as whole tokens. Both sides of the oracle use the
    * same marker lists, so ID is deterministic.
    */
  def langScore(text: Column, markers: Seq[String]): Column =
    markers
      .map(m => substrCount(concat(lit(" "), text, lit(" ")), s" $m "))
      .reduce(_ + _)

  /** Heuristic language ID over marker-word lists; ties broken by list
    * order (first wins). Returns the language key of the best score, or
    * `fallback` when all scores are 0.
    */
  def langId(text: Column, markerSets: Seq[(String, Seq[String])], fallback: String): Column = {
    val scored = markerSets.map { case (lang, ms) => (lang, langScore(text, ms)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // Left-to-right when/otherwise chain: the FIRST language reaching
    // the best score wins ties, matching the oracle's CASE ordering.
    scored.foldRight(lit(fallback): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** BPE-style pre-tokenizer count: GPT-2-ish segmentation into
    * apostrophe-suffixes / letter runs / digit runs / other-symbol
    * runs. Approximates subword token counts without a vocab — the
    * standard cheap "how many LLM tokens is this" estimator.
    */
  val bpeishPattern = "'[a-z]+|[a-z]+|[0-9]+|[^a-z0-9\\s]+"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpeishPattern), lit(0))).cast("long")

  /** Punctuation character count (.,!?;:). */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("long")

  /** Mean token length ×1000, as an exact integer ratio floor —
    * cross-engine-stable quality feature.
    */
  def meanTokenLenMilli(text: Column): Column =
    floor(length(regexp_replace(trim(text), "\\s+", "")) * 1000L / tokenCount(text)).cast("long")

  /** Unicode NFC canonical composition (native expression over the
    * JDK normalizer — Spark has no built-in). See
    * org.apache.spark.sql.graft.NormalizeNfc.
    */
  def normalizeNfc(text: Column): Column =
    org.apache.spark.sql.graft.NormalizeNfc(text)

  /** C0 control characters (except tab/newline) and DEL — the bytes
    * that crash tokenizers and leak terminal escapes into training
    * text. Shared between the cleaner and its counting report.
    */
  val controlCharClass = "[\\x00-\\x08\\x0B-\\x1F\\x7F]"

  /** Count of stripped-class control characters. */
  def controlCharCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, controlCharClass, ""))).cast("long")

  /** Standard text cleanup: NFC-compose, then strip control chars
    * (keeping tab/newline). NFC first — composition can only shorten
    * text and never produces control characters, so the two passes
    * commute with this ordering fixed.
    */
  def cleanText(text: Column): Column =
    regexp_replace(normalizeNfc(text), controlCharClass, "")

  /** Document fingerprint: md5 hex of normalized text (lowercased,
    * whitespace collapsed to single spaces, trimmed).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** First 8 hex chars of the fingerprint as an unsigned 32-bit int in
    * a long — a compact numeric doc key (engine-portable: same md5,
    * same hex-parse).
    */
  def fingerprint32(text: Column): Column =
    conv(substring(fingerprint(text), 1, 8), 16, 10).cast("long")
}
