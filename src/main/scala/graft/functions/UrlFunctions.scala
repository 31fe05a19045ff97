package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL curation surface for web-scale corpus prep (the C4/CommonCrawl
  * staple next to dedup and quality filtering): parse out host / path /
  * query params with Spark's codegen'd `parse_url`, reduce hosts to a
  * registrable domain, and cap the number of documents any one domain
  * may contribute (boilerplate farms otherwise dominate a crawl).
  *
  * All scan-side scalar expressions — zero shuffles until the cap's
  * per-domain window, which shuffles once on the domain key.
  */
object UrlFunctions {

  def urlHost(url: Column): Column = parse_url(url, lit("HOST"))

  def urlPath(url: Column): Column = parse_url(url, lit("PATH"))

  def urlQueryParam(url: Column, key: String): Column =
    parse_url(url, lit("QUERY"), lit(key))

  /** Last two host labels ("a.b.site.com" → "site.com"). A real crawl
    * pipeline consults the Public Suffix List for eTLD+1 (offline here);
    * the two-label reduction is the standard PSL-free approximation.
    */
  def registrableDomain(host: Column): Column =
    substring_index(host, ".", -2)

  /** Crawl-frontier URL canonicalization — the dedup key every web
    * pipeline computes before content ever downloads (the same page is
    * reachable under scheme/host case variants, `www.`, tracking
    * params, fragments, and trailing slashes; deduping on the RAW url
    * re-crawls it once per variant). Steps, each a codegen'd regexp on
    * the scan:
    *   1. strip the fragment (`#...` never reaches the server);
    *   2. lowercase scheme+host (case-insensitive per RFC 3986) and
    *      drop a leading `www.`;
    *   3. remove tracking parameters (`utm_*`, `fbclid`, `gclid`) and
    *      heal the separators they leave behind;
    *   4. drop a trailing path slash.
    * Param ORDER is preserved (a full canonicalizer would sort the
    * surviving params; order-stable sources don't need it and SQL
    * engines can then share the regex pipeline verbatim).
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val schemeHost = regexp_replace(
      lower(regexp_extract(noFrag, "^([^/?#]*//[^/?#]*)", 1)),
      "://www\\.", "://")
    val rest = regexp_extract(noFrag, "^[^/?#]*//[^/?#]*(.*)$", 1)
    // schemeless/relative URLs (no "//"): both extracts would return ""
    // and every such URL would collapse to one empty canonical group —
    // leave the string opaque instead and let the later steps apply.
    val rebuilt = when(noFrag.rlike("^[^/?#]*//"), concat(schemeHost, rest))
      .otherwise(noFrag)
    // Tracking params are removed only at a QUERY-PARAM BOUNDARY
    // ([?&] kept via the capture) — an unanchored pattern corrupts
    // paths containing "utm_..." text and suffix-matching param names
    // ("xgclid=2"); the inner + loop consumes ADJACENT tracking params
    // in one match, which a delimiter-consuming single-param pattern
    // cannot (the regex scan resumes after the replacement, so the
    // second of "?utm_a=1&utm_b=2" would otherwise survive).
    val noTrack = regexp_replace(
      rebuilt,
      "([?&])((utm_[a-zA-Z]+|fbclid|gclid)=[^&]*(&|$))+", "$1")
    val healed = regexp_replace(regexp_replace(noTrack, "\\?&", "?"), "[?&]+$", "")
    regexp_replace(healed, "/+(\\?|$)", "$1")
  }

  /** Per-domain contribution cap: keep at most `k` rows per registrable
    * domain of `urlCol`, ranked by `orderCol` DESC with a unique
    * tie-break (determinism rule). One shuffle on the domain key.
    * Emits `host`, `domain`, and the per-domain rank `rn`.
    */
  def capPerDomain(
      docs: DataFrame,
      urlCol: String,
      orderCol: Column,
      tieCol: String,
      k: Int): DataFrame = {
    val withDomain = docs
      .withColumn("host", urlHost(col(urlCol)))
      .withColumn("domain", registrableDomain(col("host")))
    graft.ops.Windows.topKPerGroup(
      withDomain, Seq("domain"), orderCol, Seq(tieCol), k)
  }
}
