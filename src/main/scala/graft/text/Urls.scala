package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first dedup pass of a production crawl.
  * Before any content-level pass (exact md5, MinHash bands), crawls
  * dedupe by CANONICAL URL: the same page arrives under scheme/host case
  * variants, default ports, tracking query params, fragments, and sloppy
  * path spellings, and collapsing those is pure string work that removes
  * whole fetches before a single text byte is compared. Complements
  * `dd_exact` (same page re-rendered differently still needs the content
  * pass; different URLs serving identical content are caught there).
  *
  * Canonical form implemented (the conservative, semantics-preserving
  * subset of RFC 3986 normalization + the crawl-standard tracking-param
  * strip):
  *
  *  - scheme and host lowercased (case-insensitive by spec);
  *  - default port stripped (`:443` under https, `:80` under http) —
  *    other ports kept (they address different servers);
  *  - scheme NEVER coerced (http and https are different resources
  *    until a fetch proves otherwise);
  *  - path: slash runs collapsed, trailing slash stripped;
  *  - query: tracking params dropped ([[TrackingRe]] — the utm_ family,
  *    fbclid/gclid/msclkid click ids, bare ref), surviving params kept
  *    IN ORDER (sorting them is not semantics-preserving: servers may
  *    be order-sensitive), `?` dropped when nothing survives;
  *  - fragment always dropped (never sent to the server).
  *
  * Everything is a fixed expression chain — regexp extracts over the
  * RE2 ∩ java.util.regex dialect, a higher-order array filter for the
  * param strip — defined ONCE here for both the Spark Columns and the
  * DuckDB mirror, the [[HtmlText]] convention. Inputs are absolute
  * http(s) URLs (what a crawl frontier holds); non-URL strings
  * degenerate harmlessly (empty extracts), they do not throw.
  *
  * Scale shape: one projection pass, no shuffle, codegen'd; the host
  * aggregate and canonical-group dedup shuffle once on their keys. */
object Urls {

  /** Tracking query params dropped by canonicalization. */
  val TrackingRe = "^(utm_[a-z0-9_]+|fbclid|gclid|msclkid|ref)="

  private val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  private val HostportRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
  // the prefix class excludes '?' so the match anchors at the FIRST '?'
  // — a greedy [^#]* prefix would anchor at the LAST one and silently
  // drop everything before it for queries containing a literal '?'
  // (legal per RFC 3986), collapsing distinct pages to one canonical key
  private val QueryRe = "^[^?#]*[?]([^#]*)"

  def scheme(u: Column): Column = lower(regexp_extract(u, SchemeRe, 1))

  def host(u: Column): Column =
    lower(regexp_replace(regexp_extract(u, HostportRe, 1), ":[0-9]+$", ""))

  private def port(u: Column): Column =
    regexp_extract(regexp_extract(u, HostportRe, 1), ":([0-9]+)$", 1)

  private def normPath(u: Column): Column =
    regexp_replace(
      regexp_replace(regexp_extract(u, PathRe, 1), "/+", "/"), "/$", "")

  private def keptQuery(u: Column): Column =
    array_join(
      filter(split(regexp_extract(u, QueryRe, 1), "&"),
        x => x =!= "" && !x.rlike(TrackingRe)),
      "&")

  /** The canonical URL of `u` as one Column expression. */
  def canonical(u: Column): Column = {
    val pp = when(port(u) === "" ||
        (scheme(u) === "https" && port(u) === "443") ||
        (scheme(u) === "http" && port(u) === "80"), lit(""))
      .otherwise(concat(lit(":"), port(u)))
    val q = keptQuery(u)
    concat(scheme(u), lit("://"), host(u), pp, normPath(u),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** DuckDB mirror of the canonicalization as chained CTEs over a source
    * producing `(…, url)` — adds `sch`, `host`, and `curl` columns. */
  def canonicalCtesSql(src: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    s"""uparts AS (SELECT *,
       |    lower(regexp_extract(url, ${q(SchemeRe)}, 1)) AS sch,
       |    regexp_extract(url, ${q(HostportRe)}, 1) AS hp,
       |    regexp_extract(url, ${q(PathRe)}, 1) AS pth,
       |    regexp_extract(url, ${q(QueryRe)}, 1) AS qr
       |  FROM ($src)),
       |uparts2 AS (SELECT *,
       |    lower(regexp_replace(hp, ':[0-9]+$$', '')) AS host,
       |    regexp_extract(hp, ':([0-9]+)$$', 1) AS prt,
       |    regexp_replace(regexp_replace(pth, '/+', '/', 'g'), '/$$', '') AS path2,
       |    COALESCE(array_to_string(list_filter(string_split(qr, '&'),
       |      x -> x <> '' AND NOT regexp_matches(x, ${q(TrackingRe)})), '&'), '') AS q2
       |  FROM uparts),
       |ucanon AS (SELECT *,
       |    sch || '://' || host ||
       |    CASE WHEN prt = '' OR (sch = 'https' AND prt = '443')
       |      OR (sch = 'http' AND prt = '80') THEN '' ELSE ':' || prt END ||
       |    path2 ||
       |    CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END AS curl
       |  FROM uparts2)""".stripMargin
  }

  // ---- the planted URL fixture -------------------------------------------

  /** URL variant templates (written for this test — RFC 2606 example
    * domains, nothing real): the documents table carries no URLs, so each
    * doc draws a variant by `doc_id % 7` around a page identity
    * `doc_id div 7`. Variants 0/1/2/3/6 canonicalize to the SAME https
    * URL (case + default port, tracking params, fragment, sloppy
    * slashes), 5 keeps a real query param, 4 exercises the http:80 strip
    * while staying a distinct resource (scheme is never coerced). */
  val UrlFixture: Seq[(Int, String)] = Seq(
    0 -> "https://site{h}.example.com/articles/item{p}",
    1 -> "HTTPS://Site{h}.EXAMPLE.Com:443/articles/item{p}",
    2 -> "https://site{h}.example.com/articles/item{p}?utm_source=feed&utm_medium=rss",
    3 -> "https://site{h}.example.com/articles/item{p}#section-2",
    4 -> "http://site{h}.example.com:80/articles/item{p}?gclid=abc123&ref=tw#top",
    5 -> "https://site{h}.example.com/articles/item{p}?id=9&utm_campaign=x&fbclid=zz",
    6 -> "https://site{h}.example.com//articles//item{p}/")

  /** The fixture corpus `(doc_id, url)` off any documents-shaped frame. */
  def urlCorpus(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val fixture = docs.sparkSession.createDataFrame(UrlFixture)
      .toDF("fid", "tpl")
    docs
      .select(col("doc_id"),
        (col("doc_id") % UrlFixture.size).cast("int").as("fid"),
        expr("doc_id div 7").as("pid"))
      .join(broadcast(fixture), "fid")
      .select(col("doc_id"),
        replace(
          replace(col("tpl"), lit("{h}"), (col("pid") % 5).cast("string")),
          lit("{p}"), col("pid").cast("string")).as("url"))
  }

  /** DuckDB mirror of [[urlCorpus]]. */
  def urlCorpusSql: String = {
    val values = UrlFixture.map { case (i, t) => s"($i, '$t')" }.mkString(", ")
    s"""SELECT d.doc_id AS doc_id,
       |    replace(replace(f.tpl, '{h}', CAST((d.doc_id // 7) % 5 AS VARCHAR)),
       |      '{p}', CAST(d.doc_id // 7 AS VARCHAR)) AS url
       |  FROM documents d
       |  JOIN (VALUES $values) f(fid, tpl) ON f.fid = d.doc_id % ${UrlFixture.size}""".stripMargin
  }
}
