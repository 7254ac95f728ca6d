package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the step between a crawl's raw HTML pages
  * ([[graft.sources.WarcSource]]) and the `documents(text)` table every
  * downstream stage (dedup → decontaminate → gates → mix → pack)
  * consumes. The reference evidences exactly this intended text-ingestion
  * pipeline without shipping it (unused sentence-transformers/jieba deps
  * + data/datawhale.txt, pyproject.toml:7-13); this is its front half.
  *
  * The extraction is a fixed chain of regex/replace expressions — pure
  * codegen'd string work, no UDF, no parser object per row — in the
  * order that makes each step safe for the next:
  *
  *  1. drop whole non-content ELEMENTS (script, style, then the
  *     boilerplate blocks nav/header/footer) while their tags still
  *     delimit them — a script body may contain literal `</p>` text that
  *     must not survive as content, so element removal precedes any tag
  *     stripping;
  *  2. drop comments;
  *  3. turn block-element CLOSES (+ `<br>`) into newlines so paragraph
  *     structure survives the strip;
  *  4. strip every remaining tag to a space;
  *  5. decode the common entities, `&amp;` LAST (decoding it earlier
  *     would create new `&lt;`-shaped text out of double-escaped input —
  *     the exact inverse of escaping it FIRST);
  *  6. normalize whitespace (collapse runs, tighten newlines, trim).
  *
  * Every pattern lives here ONCE and feeds both the Spark chain
  * ([[extract]]) and the DuckDB mirror ([[extractSql]]), so the two
  * cannot drift. Patterns stay inside the RE2 ∩ java.util.regex dialect:
  * inline `(?is)` flags and lazy `.*?` only — no backreferences, no
  * lookaround (RE2 has neither).
  *
  * Scale shape: one projection pass, no shuffle, whole-stage codegen'd;
  * at 100 TB this runs at scan speed next to the WARC reader. */
object HtmlText {

  /** (pattern, is-newline-replacement) element/comment removal steps, in
    * order. Separate passes per element name keep the close-tag honest
    * (an alternation `</(nav|footer)>` could pair `<nav>` with
    * `</footer>`). */
  private[graft] val RemovalSteps: Seq[String] = Seq(
    "(?is)<script[^>]*>.*?</script>",
    "(?is)<style[^>]*>.*?</style>",
    "(?s)<!--.*?-->",
    "(?is)<nav[^>]*>.*?</nav>",
    "(?is)<header[^>]*>.*?</header>",
    "(?is)<footer[^>]*>.*?</footer>")

  /** Block-element closes + `<br>` → newline: paragraph boundaries
    * survive the strip as line boundaries. The `<br` match is
    * name-anchored — the tag name must end at whitespace, `/`, or `>` —
    * so a tag that merely STARTS with "br" (`<brand …>`) falls through
    * to [[TagPattern]]'s space replacement instead of minting a bogus
    * paragraph boundary. */
  private[graft] val BlockBreakPattern: String =
    "(?i)</(p|div|h[1-6]|li|tr|table|ul|ol|article|section|blockquote|pre|title)>" +
      "|<br(?:\\s[^>]*)?/?>"

  /** Any remaining tag → space. */
  private[graft] val TagPattern: String = "(?s)<[^>]+>"

  /** Entity decodes in application order — `&amp;` strictly last
    * (mirror-inverse of [[escape]], which escapes `&` strictly first). */
  private[graft] val EntityDecodes: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** Whitespace normalization: collapse horizontal runs, tighten spaces
    * around newlines, collapse newline runs, trim the ends. */
  private[graft] val WsSteps: Seq[(String, String)] = Seq(
    "[ \\t]+" -> " ", " ?\\n ?" -> "\n", "\\n+" -> "\n",
    "^\\s+|\\s+$" -> "")

  /** Escape text for embedding as HTML content — `&` FIRST, the exact
    * inverse of [[EntityDecodes]]'s order. */
  def escape(text: Column): Column =
    Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;")
      .foldLeft(text) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }

  /** Driver-side twin of [[escape]]. */
  def escapeStr(text: String): String =
    text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Driver-side exact entity decode — [[EntityDecodes]] minus the lossy
    * `&nbsp;`/quote entries, for the byte-exact WARC round-trip
    * ([[graft.sources.WarcSource.readDocuments]]): decodes only what
    * [[escapeStr]] produced, in mirror order, `&amp;` last. */
  def unescapeStr(text: String): String =
    text.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  /** The full extraction chain as one Column expression. */
  def extract(html: Column): Column = {
    val afterRemoval = RemovalSteps.foldLeft(html)(
      (c, p) => regexp_replace(c, p, " "))
    val afterBreaks = regexp_replace(afterRemoval, BlockBreakPattern, "\n")
    val afterTags = regexp_replace(afterBreaks, TagPattern, " ")
    val afterEntities = EntityDecodes.foldLeft(afterTags) {
      case (c, (from, to)) => replace(c, lit(from), lit(to))
    }
    WsSteps.foldLeft(afterEntities) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    }
  }

  /** DuckDB mirror of [[extract]] over a SQL expression producing the
    * HTML — the same patterns, the same order; newline replacements ride
    * as chr(10) and the entity decodes as plain `replace`. */
  def extractSql(htmlExpr: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val afterRemoval = RemovalSteps.foldLeft(htmlExpr)(
      (e, p) => s"regexp_replace($e, ${q(p)}, ' ', 'g')")
    val afterBreaks =
      s"regexp_replace($afterRemoval, ${q(BlockBreakPattern)}, chr(10), 'g')"
    val afterTags = s"regexp_replace($afterBreaks, ${q(TagPattern)}, ' ', 'g')"
    val afterEntities = EntityDecodes.foldLeft(afterTags) {
      case (e, (from, to)) =>
        val toSql = if (to == "\n") "chr(10)" else q(to)
        s"replace($e, ${q(from)}, $toSql)"
    }
    WsSteps.foldLeft(afterEntities) { case (e, (p, r)) =>
      val rSql = if (r == "\n") "chr(10)" else q(r)
      s"regexp_replace($e, ${q(p)}, $rSql, 'g')"
    }
  }

  // ---- the planted page template ----------------------------------------
  // One fixture page shape shared by the tx_html_text entry (built
  // in-query on BOTH engines) and the WARC egress writer: realistic
  // boilerplate — head matter, script with a literal "</p>" payload,
  // nav/footer chrome, a comment — around the document text in an
  // <article> block with stable markers for the byte-exact WARC
  // round-trip recovery.

  private[graft] val PageHead: String =
    "<!DOCTYPE html><html><head><title>Doc "
  private[graft] val PageAfterTitle: String =
    "</title><style>p { color: #333; }</style>" +
      "<script>if (1 < 2) { track(\"</p>\"); }</script></head><body>" +
      "<nav><a href=\"/\">home</a> | <a href=\"/next\">next</a></nav>" +
      "<!-- render -->" +
      "<div class=\"main\"><h1>Entry "
  private[graft] val PageBeforeText: String = "</h1><article><p>"
  // outlinks AFTER the article block (inside it would break the WARC
  // byte-exact article recovery): two absolute URLs derived from the doc
  // id — the first clean https with a tracking param, the second a
  // case/default-port/fragment mess — so outlink extraction exercises
  // the full canonicalization chain on every page
  private[graft] val PageAfterArticle: String = "</p></article><p>see <a href=\""
  private[graft] val PageBetweenLinks: String = "\">ref</a> and <a href=\""
  private[graft] val PageAfterLinks: String =
    "\">also</a></p><footer>(c) corp.example</footer></body></html>"

  private[graft] def linkUrl1(docId: Column): Column =
    concat(lit("https://site"), pmod(docId + 1, lit(5)),
      lit(".example.com/articles/item"), docId + 1, lit("?utm_source=page"))
  private[graft] def linkUrl2(docId: Column): Column =
    concat(lit("HTTP://Site"), pmod(docId + 2, lit(5)),
      lit(".EXAMPLE.com:80/articles/item"), docId + 2, lit("#ref"))

  private def linkUrl1Str(docId: Long): String =
    s"https://site${(docId + 1) % 5}.example.com/articles/item${docId + 1}?utm_source=page"
  private def linkUrl2Str(docId: Long): String =
    s"HTTP://Site${(docId + 2) % 5}.EXAMPLE.com:80/articles/item${docId + 2}#ref"

  private def linkUrl1Sql(id: String): String =
    s"'https://site' || CAST(($id + 1) % 5 AS VARCHAR) || " +
      s"'.example.com/articles/item' || CAST($id + 1 AS VARCHAR) || '?utm_source=page'"
  private def linkUrl2Sql(id: String): String =
    s"'HTTP://Site' || CAST(($id + 2) % 5 AS VARCHAR) || " +
      s"'.EXAMPLE.com:80/articles/item' || CAST($id + 2 AS VARCHAR) || '#ref'"

  /** The fixture page as a Column (escaped text embedded). */
  def page(docId: Column, text: Column): Column =
    concat(lit(PageHead), docId, lit(PageAfterTitle), docId,
      lit(PageBeforeText), escape(text), lit(PageAfterArticle),
      linkUrl1(docId), lit(PageBetweenLinks), linkUrl2(docId),
      lit(PageAfterLinks))

  /** Driver/executor-side String twin of [[page]] (the WARC writer). */
  def pageStr(docId: Long, text: String): String =
    PageHead + docId + PageAfterTitle + docId + PageBeforeText +
      escapeStr(text) + PageAfterArticle + linkUrl1Str(docId) +
      PageBetweenLinks + linkUrl2Str(docId) + PageAfterLinks

  /** DuckDB mirror of [[page]]. */
  def pageSql(docIdExpr: String, textExpr: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val esc =
      s"replace(replace(replace($textExpr, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    s"${q(PageHead)} || CAST($docIdExpr AS VARCHAR) || ${q(PageAfterTitle)} || " +
      s"CAST($docIdExpr AS VARCHAR) || ${q(PageBeforeText)} || $esc || " +
      s"${q(PageAfterArticle)} || ${linkUrl1Sql(docIdExpr)} || " +
      s"${q(PageBetweenLinks)} || ${linkUrl2Sql(docIdExpr)} || ${q(PageAfterLinks)}"
  }
}
