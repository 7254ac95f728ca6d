package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** CSV readers/writers for the canonical tables — the other interchange
  * format corpora actually arrive in (exports, spreadsheets, legacy
  * drops). Same design rules as [[JsonlSource]]:
  *
  *  - EXPLICIT schema always (CSV inference is an extra full pass at
  *    100 TB and type-drifts between drops), cast to canonical types.
  *  - RFC-4180 quoting (quote `"`, escape by doubled quote) so free text
  *    with embedded commas, quotes, and NEWLINES round-trips exactly —
  *    gated value-level by the `src_csv_agg` oracle and the CsvSpec
  *    round-trip equality.
  *  - Reads use `multiLine = true` because quoted text can span lines.
  *    The scale caveat that comes with it, stated honestly: a multiLine
  *    CSV file is NOT splittable (the parser cannot resync mid-quote), so
  *    read parallelism = file count. The write side therefore controls
  *    file count (clustered writes, same rule as every layout here) —
  *    which is also why parquet/JSONL remain the preferred internal
  *    formats and CSV is an EDGE format: ingest once, convert.
  *  - Malformed rows drop by default (`DROPMALFORMED` — a bad line must
  *    not kill a 100 TB ingest); `dropMalformed = false` keeps them as
  *    PERMISSIVE nulls for auditing.
  *
  * Vectors are not representable in flat CSV; embedding interchange stays
  * in JSONL/parquet ([[JsonlSource.readEmbeddings]]). */
object CsvSource {

  /** Read a documents corpus from CSV with the canonical schema
    * ([[JsonlSource.documentsSchema]]). */
  def readDocuments(spark: SparkSession, path: String,
      dropMalformed: Boolean = true): DataFrame =
    spark.read
      .schema(JsonlSource.documentsSchema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("mode", if (dropMalformed) "DROPMALFORMED" else "PERMISSIVE")
      .csv(path)

  /** Write any (flat-typed) DataFrame as RFC-4180 CSV with a header.
    * `partitionCol` clusters rows first so each partition value gets one
    * file, not one per task (the dynamic-partition-write rule). */
  def write(df: DataFrame, path: String, partitionCol: Option[String] = None): Unit = {
    // the WRITE side's whitespace-trim options default to TRUE (unlike
    // reads) — left at defaults they silently strip leading/trailing
    // field whitespace and break the exact round-trip contract
    def opts(d: DataFrame) = d.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
    partitionCol match {
      case Some(c) => opts(df.repartition(col(c))).partitionBy(c).csv(path)
      case None => opts(df).csv(path)
    }
  }
}
