package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.multimodal.Multimodal

/** Multimodal pipeline query: binary payload → (stub) decoded metadata.
  * The expression-level mirror of [[Multimodal.fakeDecode]] lets the whole
  * decode pipeline be oracle-checked; the mapPartitions decoder variant is
  * equivalence-tested against this in ScalaTest. */
object MultimodalQueries {

  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val withPayload = Multimodal.withPayload(VectorModel.documents(spark, dir), "text")
    withPayload.select(
      col("doc_id"),
      (lit(32) + octet_length(col("payload")) % 609).cast("long").as("width"),
      (lit(32) + (octet_length(col("payload")) * 7) % 449).cast("long").as("height"),
      lit(3L).as("channels"),
      (lit(1) + octet_length(col("payload")) % 30).cast("long").as("n_frames"),
      octet_length(col("payload")).cast("long").as("size_bytes"))
      .orderBy("doc_id")
  }

  val mediaFeaturesSql: String =
    """SELECT doc_id,
      |  CAST(32 + octet_length(CAST(text AS BLOB)) % 609 AS BIGINT) AS width,
      |  CAST(32 + (octet_length(CAST(text AS BLOB)) * 7) % 449 AS BIGINT) AS height,
      |  CAST(3 AS BIGINT) AS channels,
      |  CAST(1 + octet_length(CAST(text AS BLOB)) % 30 AS BIGINT) AS n_frames,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS size_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_media_features" -> (mediaFeatures _))

  val oracleSql: Map[String, String] = Map(
    "mm_media_features" -> mediaFeaturesSql)
}
