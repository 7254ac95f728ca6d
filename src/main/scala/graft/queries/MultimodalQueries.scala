package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.multimodal.Multimodal

/** Multimodal pipeline queries over REAL decoded containers: every
  * document row carries a valid BMP / binary-PPM / PCM-WAV payload
  * (synthesized deterministically from its id — the planted binary
  * fixture at every SF), the serving path parses the actual bytes with
  * the pure-JVM [[graft.multimodal.MediaCodec]], and the DuckDB oracle
  * computes the SAME metadata from the id's closed forms WITHOUT parsing
  * — hash equality therefore proves the decoder reads headers, raster
  * sizes, and chunk layouts correctly. A malformed payload fails the job
  * loudly (spec-gated), never emits garbage rows. */
object MultimodalQueries {

  /** Decode features for every document: payload → (width, height,
    * channels, n_frames, size_bytes) via the codegen'd
    * [[graft.functions.MediaExpressions.decode]] kernel. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val withPayload =
      Multimodal.withMediaPayload(VectorModel.documents(spark, dir), "doc_id")
    withPayload
      .withColumn("meta", graft.functions.MediaExpressions.decode(col("payload")))
      .select(
        col("doc_id"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"),
        col("meta.channels").cast("long").as("channels"),
        col("meta.nFrames").cast("long").as("n_frames"),
        col("meta.sizeBytes").as("size_bytes"))
      .orderBy("doc_id")
  }

  /** The fixture's closed forms, as a reusable subquery (the oracle's
    * mirror of [[graft.functions.MediaKernel.fixture]] — id rotation
    * doc_id%3 over BMP/PPM/WAV, every 150th id a large BMP). */
  private val fixtureFormsSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN
      |         CASE WHEN doc_id % 150 = 0 THEN 300 + doc_id % 301
      |              ELSE 4 + doc_id % 13 END
      |       WHEN doc_id % 3 = 1 THEN 4 + doc_id % 17
      |       ELSE 0 END AS width,
      |  CASE WHEN doc_id % 3 = 0 THEN
      |         CASE WHEN doc_id % 150 = 0 THEN 200 + (doc_id * 3) % 201
      |              ELSE 4 + (doc_id * 3) % 11 END
      |       WHEN doc_id % 3 = 1 THEN 4 + (doc_id * 5) % 13
      |       ELSE 0 END AS height,
      |  CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 2 ELSE 3 END AS channels,
      |  CASE WHEN doc_id % 3 = 2 THEN 100 + doc_id % 900 ELSE 1 END AS n_frames
      |FROM documents""".stripMargin

  val mediaFeaturesSql: String =
    s"""SELECT doc_id,
      |  CAST(width AS BIGINT) AS width,
      |  CAST(height AS BIGINT) AS height,
      |  CAST(channels AS BIGINT) AS channels,
      |  CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST(CASE WHEN doc_id % 3 = 0 THEN
      |         54 + ((3 * width + 3) // 4) * 4 * height
      |       WHEN doc_id % 3 = 1 THEN
      |         9 + length(CAST(width AS VARCHAR)) + length(CAST(height AS VARCHAR))
      |           + 3 * width * height
      |       ELSE 44 + n_frames * channels * 2 END AS BIGINT) AS size_bytes
      |FROM ($fixtureFormsSql)
      |ORDER BY doc_id""".stripMargin

  /** Frame-sampling plan per document: which frame indices the sampler
    * would decode — mirrors [[Multimodal.sampleFrameIndices]]'s closed
    * form (i·n/max integer division) as scalars. Raster rows have one
    * frame; WAV rows sample their PCM frames. */
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
    s"""SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST(least(n_frames, 4) AS BIGINT) AS n_sampled,
      |  CAST(0 AS BIGINT) AS first_idx,
      |  CAST(CASE WHEN n_frames <= 4 THEN n_frames - 1
      |       ELSE (3 * n_frames) // 4 END AS BIGINT) AS last_idx
      |FROM ($fixtureFormsSql)
      |ORDER BY doc_id""".stripMargin

  /** Resize plan per document: bound the longest side to 256 preserving
    * aspect — mirror of [[Multimodal.resizePlan]]'s integer arithmetic.
    * The every-150th-id large BMPs are the rows that actually downscale;
    * small rasters and WAV (0×0) no-op. */
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
    s"""SELECT doc_id, CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
      |  CAST(CASE WHEN greatest(width, height) <= 256 THEN width
      |       ELSE (width * 256) // greatest(width, height) END AS BIGINT) AS out_w,
      |  CAST(CASE WHEN greatest(width, height) <= 256 THEN height
      |       ELSE (height * 256) // greatest(width, height) END AS BIGINT) AS out_h
      |FROM ($fixtureFormsSql)
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
