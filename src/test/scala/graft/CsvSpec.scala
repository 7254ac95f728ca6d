package graft

import graft.model.VectorModel
import graft.sources.CsvSource

/** CSV ingest/egress: RFC-4180 quoting must round-trip the documents
  * table value-for-value — including pathological free text with commas,
  * quotes, and embedded newlines — and malformed rows must drop instead
  * of killing the read. */
class CsvSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("doc_id", "text", "lang", "source", "n_chars")
    .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).sortBy(_._1).toSeq

  test("documents round-trip through CSV value-identically") {
    val docs = VectorModel.documents(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_docs").toString
    CsvSource.write(docs, s"$dir/out")
    assert(rows(CsvSource.readDocuments(spark, s"$dir/out")) === rows(docs))
  }

  test("commas, quotes, and embedded newlines survive the quoting") {
    val nasty = Seq(
      (1L, "plain text", "en", "s", 10L),
      (2L, "comma, separated, values", "en", "s", 24L),
      (3L, "a \"quoted\" word", "en", "s", 15L),
      (4L, "line one\nline two\nline three", "en", "s", 28L),
      (5L, "all, of \"it\",\ntogether", "en", "s", 22L),
      (6L, "  padded with spaces  ", "en", "s", 22L))
    val df = spark.createDataFrame(nasty)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_nasty").toString
    CsvSource.write(df, s"$dir/out")
    assert(rows(CsvSource.readDocuments(spark, s"$dir/out")) === rows(df))
  }

  test("malformed rows drop instead of failing the read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_bad").toString
    val text = "doc_id,text,lang,source,n_chars\n" +
      "1,hello,en,s0,5\n" +
      "not_a_long,broken,xx,s0,also_not_a_long\n" +
      "2,world,en,s0,5\n"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/in.csv"), text.getBytes("UTF-8"))
    val got = CsvSource.readDocuments(spark, s"$dir/in.csv")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(1L, 2L))
  }
}
