package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing stage every training-data
  * pipeline runs before a corpus ships: count and mask emails, phone
  * numbers, and IPv4 addresses with typed placeholder tokens.
  *
  * An extension past the reference (no text pipeline there); the shape
  * follows the public corpus-cleaning recipes (C4/Gopher-style regex
  * scrubbing). Everything is `regexp_count`/`regexp_replace` — codegen'd
  * expressions, no UDF, so the scan stays in whole-stage codegen and the
  * operator is a pure per-row map (no shuffle at any scale).
  *
  * The patterns are deliberately restricted to syntax with IDENTICAL
  * semantics under Java regex (Spark) and RE2 (DuckDB): character
  * classes, bounded repetition, `\b` word boundaries (both engines define
  * word chars as [A-Za-z0-9_]), no backrefs, no lookaround — that is what
  * keeps the operator hash-gated against the oracle.
  *
  * Redaction order is pinned (email → phone → ipv4) on both sides:
  * placeholder tokens contain no digits or dots, so an earlier pass never
  * manufactures a later pass's match, but a fixed order makes the
  * composition deterministic by construction rather than by argument.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+\\d{1,3}-\\d{2,4}-\\d{3,4}-\\d{4}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Non-overlapping match counts, BIGINT (the oracle's len() type). */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe)).cast("long")
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe)).cast("long")
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re)).cast("long")

  /** Masked text: every PII span replaced by its typed placeholder, in the
    * pinned pass order. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** The same three passes as DuckDB SQL over a text expression. */
  def redactSql(text: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($text, " +
      s"'$EmailRe', '<EMAIL>', 'g'), " +
      s"'$PhoneRe', '<PHONE>', 'g'), " +
      s"'$Ipv4Re', '<IP>', 'g')"

  /** DuckDB match count over a text expression. */
  def countSql(text: String, re: String): String =
    s"CAST(len(regexp_extract_all($text, '$re')) AS BIGINT)"
}
