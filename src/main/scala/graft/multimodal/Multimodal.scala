package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * decode/feature-extract stages, and frame sampling.
  *
  * Decode is REAL for three trivial containers — 24-bit BMP, binary PPM,
  * PCM WAV — via the dependency-free [[MediaCodec]] (this environment
  * ships no image/audio libraries; production swaps richer codecs in at
  * the same `decode` signature). A payload that is not a well-formed
  * supported container FAILS THE JOB loudly with the parse reason — no
  * silent garbage metadata.
  *
  * Scale notes: binary payloads dominate row size, so (a) metadata-only
  * queries must never touch the payload column — Parquet column pruning
  * does this for free when the decode is a separate projected stage; and
  * (b) decode work is embarrassingly parallel → `mapPartitions`, sized by
  * `spark.sql.files.maxPartitionBytes`, no shuffle.
  */
object Multimodal {

  /** Typed metadata produced by the decoder (raster containers:
    * width/height/channels with nFrames=1; WAV: channels + PCM sample
    * frames with width=height=0). */
  case class MediaMeta(
      width: Int, height: Int, channels: Int, nFrames: Int, sizeBytes: Long)

  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("nFrames", IntegerType, nullable = false),
    StructField("sizeBytes", LongType, nullable = false)))

  /** Attach a binary payload column (utf8 text bytes — the opaque-blob
    * stand-in for plumbing tests that never decode). */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  /** Attach a REAL container payload per row — a valid BMP / PPM / WAV
    * synthesized deterministically from the id
    * ([[graft.functions.MediaKernel.fixture]]). This is the planted
    * binary fixture at every SF: the ids are the dataset's own, so every
    * scale factor carries decodable media rows with closed-form expected
    * metadata. */
  def withMediaPayload(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("payload",
      graft.functions.MediaExpressions.fixture(col(idCol)))

  /** Attach a REAL Y4M video payload per row — a valid multi-frame clip
    * synthesized deterministically from the id
    * ([[graft.functions.MediaKernel.videoFixture]]); the video fixture
    * beside [[withMediaPayload]]'s image/audio rotation, on EVERY row
    * (the modalities are separate columns in a real corpus, not a
    * rotation). */
  def withVideoPayload(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("payload",
      graft.functions.MediaExpressions.videoFixture(col(idCol)))

  /** Partition-parallel decode: binary payload → typed metadata struct.
    * Runs [[MediaCodec.decode]] once per row inside mapPartitions — the
    * shape a batched JNI decoder needs (amortized per-partition init);
    * equivalence with the expression-kernel decode is spec-gated. */
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
        val m = MediaCodec.decode(r.getAs[Array[Byte]](payloadIdx))
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
