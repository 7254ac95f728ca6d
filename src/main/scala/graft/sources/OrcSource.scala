package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** ORC readers/writers for the canonical tables — the OTHER columnar
  * interchange format (Hive-ecosystem pipelines exchange corpora in ORC
  * the way lakehouse ones use parquet). Spark's ORC support is built in;
  * like parquet and unlike JSONL/CSV, the format is self-describing and
  * columnar, so column pruning and predicate pushdown reach the scan.
  *
  * The reader still PINS the expected schema ([[JsonlSource]]'s explicit-
  * schema rule): a self-describing file's schema is whatever the writer
  * left there, and a silent upstream type drift (int where the corpus has
  * long) should fail loudly at the seam, not propagate — so reads verify
  * the canonical column set instead of trusting the footer. */
object OrcSource {

  /** Write a documents corpus as ORC (snappy, the cross-ecosystem
    * default). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "snappy").orc(path)

  /** Read a documents corpus, verifying the canonical columns exist with
    * the canonical types (extra columns pass through — the open-schema
    * contract of the documents table). */
  def readDocuments(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.orc(path)
    val expected = JsonlSource.documentsSchema.fields.map(f => f.name -> f.dataType)
    val got = df.schema.fields.map(f => f.name -> f.dataType).toMap
    expected.foreach { case (name, dt) =>
      require(got.get(name).contains(dt),
        s"orc documents at $path: expected column $name: $dt, " +
          s"found ${got.get(name).map(_.toString).getOrElse("missing")}")
    }
    df
  }
}
