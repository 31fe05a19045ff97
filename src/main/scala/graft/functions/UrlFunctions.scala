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
