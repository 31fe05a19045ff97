package graft

import graft.functions.UrlFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks for crawl-URL canonicalization over generated messy
  * URLs (fixed seeds, deterministic): idempotence, invariance to the
  * noise dimensions it claims to remove, and well-formedness of the
  * canonical key.
  */
class UrlPropertySpec extends SparkSpec {
  import spark.implicits._

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http://", "https://", "HTTPS://", "Http://")
    www <- Gen.oneOf("", "www.", "WWW.")
    host <- Gen.oneOf("site.com", "Site.COM", "sub.site.org")
    segs <- Gen.choose(0, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("p", "a1", "x-y", "items")))
    slash <- Gen.oneOf("", "/")
    real <- Gen.choose(0, 2).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("id=7", "page=2", "q=spark")))
    track <- Gen.choose(0, 2).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("utm_source=feed", "utm_campaign=x", "gclid=abc", "fbclid=zz")))
    params <- Gen.const(new scala.util.Random(42).shuffle(real ++ track))
    frag <- Gen.oneOf("", "#frag", "#a/b")
  } yield {
    val path = if (segs.isEmpty) "" else segs.mkString("/", "/", "")
    val query = if (params.isEmpty) "" else params.mkString("?", "&", "")
    scheme + www + host + path + slash + query + frag
  }

  private def canon(urls: Seq[String]): Seq[String] =
    urls.toDF("url")
      .select(UrlFunctions.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  private def sample(seed: Long, n: Int): List[String] =
    Gen.listOfN(n, urlGen)(Gen.Parameters.default, Seed(seed)).get

  test("canonicalizeUrl is idempotent on generated messy URLs") {
    val urls = sample(1L, 80)
    val once = canon(urls)
    val twice = canon(once)
    once.zip(twice).zip(urls).foreach { case ((a, b), raw) =>
      assert(a == b, s"not idempotent for $raw: '$a' -> '$b'")
    }
  }

  test("canonical key is invariant to fragment, host case, and appended tracking params") {
    val urls = sample(2L, 60).filterNot(_.contains("#"))
    val base = canon(urls)
    val withFrag = canon(urls.map(_ + "#later"))
    val withTrack = canon(urls.map(u => u + (if (u.contains("?")) "&utm_x=1" else "?utm_x=1")))
    base.zip(withFrag).zip(urls).foreach { case ((b, f), raw) =>
      assert(b == f, s"fragment changed canonical for $raw: '$b' vs '$f'")
    }
    base.zip(withTrack).zip(urls).foreach { case ((b, t), raw) =>
      assert(b == t, s"tracking param changed canonical for $raw: '$b' vs '$t'")
    }
  }

  test("canonical form is well-formed: no fragment, no tracking, lowercase scheme+host, no dangling separators") {
    canon(sample(3L, 80)).foreach { c =>
      assert(!c.contains("#"), s"fragment survived: $c")
      assert(!c.contains("utm_") && !c.contains("gclid") && !c.contains("fbclid"),
        s"tracking param survived: $c")
      val prefix = c.split("//")(0)
      assert(prefix == prefix.toLowerCase, s"scheme not lowercased: $c")
      assert(!c.endsWith("?") && !c.endsWith("&") && !c.contains("?&"),
        s"dangling separator: $c")
      assert(!c.contains("//www."), s"www not stripped: $c")
    }
  }
}
