package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * decode/feature-extract stages, and frame sampling.
  *
  * The decode step is a STUB — real image/audio codecs are not available in
  * this environment, so [[fakeDecode]] derives deterministic pseudo-metadata
  * from the payload bytes. Everything around it (schema, batch iteration,
  * partition-parallel execution, column pruning of the wide binary column)
  * is real: swap `fakeDecode` for a JNI/codec call and the pipeline holds.
  *
  * Scale notes: binary payloads dominate row size, so (a) metadata-only
  * queries must never touch the payload column — Parquet column pruning
  * does this for free when the decode is a separate projected stage; and
  * (b) decode work is embarrassingly parallel → `mapPartitions`, sized by
  * `spark.sql.files.maxPartitionBytes`, no shuffle.
  */
object Multimodal {

  /** Typed metadata produced by the (stubbed) decoder. */
  case class MediaMeta(
      width: Int, height: Int, channels: Int, nFrames: Int, sizeBytes: Long)

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("nFrames", IntegerType, nullable = false),
    StructField("sizeBytes", LongType, nullable = false)))

  /** STUB decoder: deterministic pseudo-metadata from payload length/bytes.
    * Replace with a real codec at the same signature. */
  def fakeDecode(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(
      width = 32 + (n % 609),
      height = 32 + ((n * 7) % 449),
      channels = 3,
      nFrames = 1 + (n % 30),
      sizeBytes = n.toLong)
  }

  /** Attach a binary payload column (here: utf8 text bytes as the stand-in
    * payload; in production this is the stored media blob). */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  /** Partition-parallel decode: binary payload → typed metadata struct.
    * Runs the decoder once per row inside mapPartitions — the shape a
    * batched JNI decoder needs (amortized per-partition init). */
  def decodeMeta(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("meta", MediaMetaSchema, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex("payload")
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition decoder init would go here (e.g. codec context)
      rows.map { r =>
        val m = fakeDecode(r.getAs[Array[Byte]](payloadIdx))
        Row(r.getLong(idIdx), Row(m.width, m.height, m.channels, m.nFrames, m.sizeBytes))
      }
    }(encoder)
  }

  /** Deterministic frame sampling: every k-th frame index up to maxFrames. */
  def sampleFrameIndices(nFrames: Int, maxFrames: Int): Seq[Int] = {
    if (nFrames <= maxFrames) 0 until nFrames
    else (0 until maxFrames).map(i => i * nFrames / maxFrames)
  }

  /** Resize plan: target dimensions bounding the longest side to maxDim
    * while preserving aspect ratio — pure integer arithmetic (floor), the
    * stage a real resampler would receive. No-op when already within
    * bounds. */
  def resizePlan(width: Int, height: Int, maxDim: Int): (Int, Int) = {
    val longest = math.max(width, height)
    if (longest <= maxDim) (width, height)
    else (width * maxDim / longest, height * maxDim / longest)
  }
}
