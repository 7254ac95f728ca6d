package graft

import org.apache.spark.sql.functions._

import graft.text.Urls

/** Gates the URL canonicalization semantics ([[graft.text.Urls]]) beyond
  * the tx_url_stats / dd_url_dedup hash oracles: which variants MUST
  * collapse, which must NOT, idempotence, and degenerate inputs. */
class UrlSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    val spark2 = spark
    import spark2.implicits._
    urls.toDF("url").select(Urls.canonical(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("equivalent spellings collapse to one canonical URL") {
    val c = canon(
      "https://site0.example.com/articles/item9",
      "HTTPS://Site0.EXAMPLE.Com:443/articles/item9",
      "https://site0.example.com/articles/item9?utm_source=feed&utm_medium=rss",
      "https://site0.example.com/articles/item9#section-2",
      "https://site0.example.com//articles//item9/",
      "https://site0.example.com/articles/item9?fbclid=x&gclid=y&msclkid=z&ref=a&utm_campaign=b")
    assert(c.distinct === Seq("https://site0.example.com/articles/item9"))
  }

  test("distinct resources stay distinct") {
    val c = canon(
      "https://a.example.com/p",         // baseline
      "http://a.example.com/p",          // scheme never coerced
      "https://a.example.com:8443/p",    // non-default port addresses another server
      "https://a.example.com/p?id=9",    // real param is content-bearing
      "https://b.example.com/p",         // other host
      "https://a.example.com/p/q")       // other path
    assert(c.distinct.size === c.size, s"collapsed: $c")
  }

  test("surviving query params keep their order; only tracking params drop") {
    val c = canon(
      "https://a.example.com/s?b=2&utm_source=x&a=1",
      "https://a.example.com/s?a=1&b=2")
    assert(c(0) === "https://a.example.com/s?b=2&a=1")
    assert(c(1) === "https://a.example.com/s?a=1&b=2")
    assert(c(0) !== c(1), "param order is semantics-bearing, must not sort")
    // a param whose NAME merely contains a tracking name is kept
    assert(canon("https://a.example.com/s?preference=1&utm_x=2").head ===
      "https://a.example.com/s?preference=1")
  }

  test("a literal '?' inside the query survives — distinct pages stay distinct") {
    // RFC 3986 allows '?' within a query; the extraction must anchor at
    // the FIRST '?' or everything before the last one silently drops and
    // different pages collapse to one canonical key
    val c = canon(
      "https://h.example.com/p?a=1?b=2",
      "https://h.example.com/p?x=9?b=2",
      "https://h.example.com/p?b=2")
    assert(c(0) === "https://h.example.com/p?a=1?b=2")
    assert(c(1) === "https://h.example.com/p?x=9?b=2")
    assert(c.distinct.size === 3, s"pages collapsed: $c")
    // tracking strip still works around the embedded '?' (split is on &)
    assert(canon("https://h.example.com/p?a=1?b=2&utm_source=x").head ===
      "https://h.example.com/p?a=1?b=2")
  }

  test("canonicalization is idempotent") {
    val raw = Urls.UrlFixture.map(_._2)
      .map(_.replace("{h}", "3").replace("{p}", "42"))
    val once = canon(raw: _*)
    val twice = canon(once: _*)
    assert(twice === once)
  }

  test("default ports strip only under their own scheme") {
    assert(canon("http://a.example.com:443/p").head ===
      "http://a.example.com:443/p")
    assert(canon("https://a.example.com:80/p").head ===
      "https://a.example.com:80/p")
    assert(canon("https://a.example.com:443/p").head ===
      "https://a.example.com/p")
    assert(canon("http://a.example.com:80/p").head ===
      "http://a.example.com/p")
  }

  test("degenerate inputs do not throw") {
    val c = canon("not a url", "", "ftp://x.example.com/file", "https://")
    assert(c.length === 4)
    // an http(s)-less scheme still canonicalizes structurally
    assert(c(2) === "ftp://x.example.com/file")
  }

  test("the planted fixture collapses 5-of-7 variants per page") {
    val docs = graft.model.VectorModel.documents(spark, Sf0001)
    val grouped = Urls.urlCorpus(docs)
      .select(expr("doc_id div 7").as("pid"),
        Urls.canonical(col("url")).as("curl"))
      .groupBy("pid").agg(countDistinct("curl").as("n"))
      .select("n").distinct().collect().map(_.getLong(0)).toSet
    // full pages: 3 canonical urls (https group of 5, the http one, the
    // ?id=9 one); the tail page may be partial
    assert(grouped.contains(3L))
    assert(grouped.forall(_ <= 3L))
  }
}
