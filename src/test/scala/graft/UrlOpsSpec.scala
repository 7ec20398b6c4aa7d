package graft

import graft.functions.UrlOps
import org.apache.spark.sql.functions._

/** Canonicalization rules pinned against hand-expected outputs — every
  * rule exercised alone and in combination, plus the inputs that must
  * pass through untouched.
  */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("scheme/host case-fold, www and default ports strip; path case is preserved") {
    assert(canon("HTTPS://WWW.Example.COM:443/Page/One") ==
      Seq("https://example.com/Page/One"))
    assert(canon("http://Site.ORG:80/a") == Seq("http://site.org/a"))
  }

  test("non-default ports survive, including https:80 and http:443") {
    assert(canon("https://example.com:8443/x") == Seq("https://example.com:8443/x"))
    assert(canon("https://example.com:80/x") == Seq("https://example.com:80/x"))
    assert(canon("http://example.com:443/x") == Seq("http://example.com:443/x"))
  }

  test("fragments drop, tracking params drop, survivors sort") {
    assert(canon("https://a.com/p?utm_source=x&b=2&a=1#frag") ==
      Seq("https://a.com/p?a=1&b=2"))
    assert(canon("https://a.com/p?gclid=1&fbclid=2&utm_campaign=z") ==
      Seq("https://a.com/p"))
  }

  test("trailing slashes collapse; bare host becomes root") {
    assert(canon("https://a.com/p/", "https://a.com/p") ==
      Seq("https://a.com/p", "https://a.com/p"))
    assert(canon("https://a.com", "https://a.com/", "https://a.com///") ==
      Seq("https://a.com/", "https://a.com/", "https://a.com/"))
  }

  test("equivalent raw variants collapse to one canonical form") {
    val variants = Seq(
      "https://www.shop.com/item/7?utm_medium=email",
      "HTTPS://SHOP.COM:443/item/7/",
      "https://shop.com/item/7#reviews")
    assert(canon(variants: _*).distinct.size == 1)
  }

  test("canonicalization is idempotent on randomized urls (fixed point property)") {
    val rnd = new scala.util.Random(77)
    val schemes = Seq("http", "HTTPS", "ftp")
    val hosts = Seq("www.A.com", "b.ORG", "WWW.c.d.net", "x.io")
    val ports = Seq("", ":80", ":443", ":8080")
    val paths = Seq("", "/", "/P/q", "/a/b/c/", "/Z//")
    val queries = Seq("", "?utm_source=1", "?z=9&a=1", "?utm_a=1&m=2&b=3")
    val frags = Seq("", "#x", "#sec/2")
    val urls = Seq.fill(200)(
      schemes(rnd.nextInt(3)) + "://" + hosts(rnd.nextInt(4)) + ports(rnd.nextInt(4)) +
        paths(rnd.nextInt(5)) + queries(rnd.nextInt(4)) + frags(rnd.nextInt(3)))
    val once = canon(urls: _*)
    val twice = canon(once: _*)
    once.zip(twice).zip(urls).foreach { case ((a, b), raw) =>
      assert(a == b, s"not a fixed point: raw=$raw once=$a twice=$b")
    }
  }
}
