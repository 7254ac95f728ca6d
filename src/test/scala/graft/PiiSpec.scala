package graft

import org.apache.spark.sql.functions._

import graft.text.Pii

/** PII scrubbing ([[graft.text.Pii]]): detector hits and misses on planted
  * strings, pass-order composition, and idempotence. The corpus-level query
  * (`tx_pii`) is hash-gated against DuckDB; these pin the pattern semantics
  * on adversarial micro-cases the fixture join doesn't isolate. */
class PiiSpec extends SparkSpec {

  private def redactOne(s: String): String =
    spark.range(1).select(Pii.redact(lit(s))).collect()(0).getString(0)

  private def counts(s: String): (Long, Long, Long) = {
    val r = spark.range(1).select(
      Pii.emailCount(lit(s)), Pii.phoneCount(lit(s)), Pii.ipv4Count(lit(s)))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("each detector hits its planted form and only that form") {
    assert(counts("mail a.b+tag@sub.example.org now") == ((1L, 0L, 0L)))
    assert(counts("dial +1-555-867-5309 twice") == ((0L, 1L, 0L)))
    assert(counts("host 10.0.0.1 up") == ((0L, 0L, 1L)))
    assert(counts("tuple (1.2,3.4) and version 1.2.3 and t@x") == ((0L, 0L, 0L)))
  }

  test("redaction masks every span with its typed placeholder") {
    assert(redactOne("ping 192.168.1.254 from ops@example.com or +44-20-7946-0958") ==
      "ping <IP> from <EMAIL> or <PHONE>")
  }

  test("multiple matches of one type all mask") {
    assert(redactOne("a@b.co c@d.io") == "<EMAIL> <EMAIL>")
    assert(counts("a@b.co c@d.io")._1 == 2L)
  }

  test("redaction is idempotent — placeholders never re-match") {
    val once = redactOne("ops@example.com at 10.0.0.1 call +1-555-867-5309")
    assert(redactOne(once) == once)
    assert(counts(once) == ((0L, 0L, 0L)))
  }

  test("version-like and decimal digit runs do not trip the ipv4 boundary") {
    // \b on both sides: digits flanked by word chars are NOT addresses
    assert(counts("build v10.0.0.1rc1") == ((0L, 0L, 0L)))
    assert(counts("x10.0.0.1") == ((0L, 0L, 0L)))
  }
}
