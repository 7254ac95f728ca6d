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

  /** Frame-sampling plan per document: which frame indices the (stubbed)
    * sampler would decode — mirrors [[Multimodal.sampleFrameIndices]]'s
    * closed form (i·n/max integer division) as scalars. */
  def framePlan(spark: SparkSession, dir: String): DataFrame = {
    val maxF = 4
    val n = col("n_frames")
    mediaFeatures(spark, dir)
      .select(
        col("doc_id"), n,
        least(n, lit(maxF.toLong)).as("n_sampled"),
        lit(0L).as("first_idx"),
        when(n <= maxF, n - 1)
          .otherwise(expr(s"(${maxF - 1} * n_frames) div $maxF")).as("last_idx"))
      .orderBy("doc_id")
  }

  val framePlanSql: String =
    """SELECT doc_id, n_frames,
      |  least(n_frames, 4) AS n_sampled,
      |  CAST(0 AS BIGINT) AS first_idx,
      |  CASE WHEN n_frames <= 4 THEN n_frames - 1
      |       ELSE (3 * n_frames) // 4 END AS last_idx
      |FROM (SELECT doc_id, CAST(1 + octet_length(CAST(text AS BLOB)) % 30 AS BIGINT) AS n_frames
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Resize plan per document: bound the longest side to 256 preserving
    * aspect — mirror of [[Multimodal.resizePlan]]'s integer arithmetic. */
  def resizePlan(spark: SparkSession, dir: String): DataFrame = {
    val maxDim = 256
    val longest = greatest(col("width"), col("height"))
    mediaFeatures(spark, dir)
      .select(
        col("doc_id"), col("width"), col("height"),
        when(longest <= maxDim, col("width"))
          .otherwise(expr(s"(width * $maxDim) div greatest(width, height)")).as("out_w"),
        when(longest <= maxDim, col("height"))
          .otherwise(expr(s"(height * $maxDim) div greatest(width, height)")).as("out_h"))
      .orderBy("doc_id")
  }

  val resizePlanSql: String =
    """SELECT doc_id, width, height,
      |  CASE WHEN greatest(width, height) <= 256 THEN width
      |       ELSE (width * 256) // greatest(width, height) END AS out_w,
      |  CASE WHEN greatest(width, height) <= 256 THEN height
      |       ELSE (height * 256) // greatest(width, height) END AS out_h
      |FROM (SELECT doc_id,
      |        CAST(32 + octet_length(CAST(text AS BLOB)) % 609 AS BIGINT) AS width,
      |        CAST(32 + (octet_length(CAST(text AS BLOB)) * 7) % 449 AS BIGINT) AS height
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_media_features" -> (mediaFeatures _),
    "mm_frame_plan" -> (framePlan _),
    "mm_resize_plan" -> (resizePlan _))

  val oracleSql: Map[String, String] = Map(
    "mm_media_features" -> mediaFeaturesSql,
    "mm_frame_plan" -> framePlanSql,
    "mm_resize_plan" -> resizePlanSql)
}
