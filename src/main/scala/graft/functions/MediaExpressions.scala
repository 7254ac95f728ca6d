package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

import graft.multimodal.MediaCodec

/** Codegen wrappers for the pure-JVM media codec
  * ([[graft.multimodal.MediaCodec]]): deterministic fixture synthesis
  * (id → a VALID container payload) and real header/raster-validating
  * decode (payload → typed metadata struct), both per-row kernels in
  * whole-stage codegen — the multimodal pipeline's plumbing with no UDF
  * node and no stub left in the serving path. */
final class MediaKernel extends Serializable {

  /** Deterministic fixture payload for a row id — format rotates
    * id mod 3 (BMP / P6 PPM / PCM WAV), parameters are closed forms of
    * the id (the oracle mirrors them WITHOUT parsing — hash equality then
    * proves [[MediaCodec.decode]] reads the bytes correctly). Every
    * 150th id gets a LARGE BMP (dims past the 256 resize bound) so the
    * resize stage exercises real downscales at every SF; 150 ≡ 0 mod 3
    * keeps the large rows inside the BMP rotation. */
  def fixture(id: Long): Array[Byte] = (id % 3) match {
    case 0 =>
      if (id % 150 == 0)
        MediaCodec.encodeBmp((300 + id % 301).toInt, (200 + (id * 3) % 201).toInt, id)
      else
        MediaCodec.encodeBmp((4 + id % 13).toInt, (4 + (id * 3) % 11).toInt, id)
    case 1 =>
      MediaCodec.encodePpm((4 + id % 17).toInt, (4 + (id * 5) % 13).toInt, id)
    case _ =>
      MediaCodec.encodeWav((1 + id % 2).toInt, (100 + id % 900).toInt, 8000, id)
  }

  def decode(p: Array[Byte]): InternalRow = {
    val m = MediaCodec.decode(p)
    new GenericInternalRow(Array[Any](m.width, m.height, m.channels,
      m.nFrames, m.sizeBytes))
  }

  /** Decode → grayscale → 64-bit dHash, one per-row kernel call
    * ([[MediaCodec.decodeGray]] + [[MediaCodec.dhash64]]). Rasters only —
    * fails loudly on non-raster payloads like every decode path. */
  def dhash(p: Array[Byte]): Long = {
    val (w, h, gray) = MediaCodec.decodeGray(p)
    MediaCodec.dhash64(w, h, gray)
  }

  /** Decode → PCM → 64-bit band-energy fingerprint, one per-row kernel
    * call ([[MediaCodec.decodePcm]] + [[MediaCodec.audioFp64]]). WAV
    * only — fails loudly on raster payloads like every decode path. */
  def audioFp(p: Array[Byte]): Long =
    MediaCodec.audioFp64(MediaCodec.decodePcm(p))

  /** Deterministic Y4M clip fixture for a row id — the VIDEO planted
    * fixture beside [[fixture]]'s image/audio rotation: dims 4–12 × 4–10,
    * 2–8 frames (ids with id mod 7 ≥ 3 exceed the 4-frame sampling
    * budget, so the frame plan's i·n/4 arithmetic is exercised at every
    * SF), every 11th id Cmono so both colorspace layouts decode. */
  def videoFixture(id: Long): Array[Byte] =
    MediaCodec.encodeY4m(
      (4 + id % 9).toInt, (4 + (id * 3) % 7).toInt, (2 + id % 7).toInt, id,
      mono = id % 11 == 0)

  /** Decode → per-sampled-frame dHash array ([[MediaCodec.videoFp]]).
    * Y4M only — fails loudly on any other payload. */
  def videoFp(p: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      MediaCodec.videoFp(p))
}

case class MediaFixture(child: Expression, kernel: MediaKernel)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument 1 of $prettyName requires bigint, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullSafeEval(id: Any): Any = kernel.fixture(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("mediaKernel", kernel, classOf[MediaKernel].getName)
    nullSafeCodeGen(ctx, ev, id => s"${ev.value} = $k.fixture($id);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "media_fixture"
}

case class MediaDecode(child: Expression, kernel: MediaKernel)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument 1 of $prettyName requires binary, got ${other.simpleString}")
  }
  override def dataType: DataType = MediaExpressions.MetaType
  override def nullSafeEval(p: Any): Any =
    kernel.decode(p.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("mediaKernel", kernel, classOf[MediaKernel].getName)
    nullSafeCodeGen(ctx, ev, p => s"${ev.value} = $k.decode($p);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "media_decode"
}

/** `media_dhash(payload)` — perceptual difference-hash of a raster
  * payload; the image near-dup key ([[graft.dedup.Dedup]]'s
  * imageNearDupPairs bands it for the Hamming pigeonhole join). */
case class MediaDhash(child: Expression, kernel: MediaKernel)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument 1 of $prettyName requires binary, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(p: Any): Any =
    kernel.dhash(p.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("mediaKernel", kernel, classOf[MediaKernel].getName)
    nullSafeCodeGen(ctx, ev, p => s"${ev.value} = $k.dhash($p);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "media_dhash"
}

/** `media_audio_fp(payload)` — time-energy fingerprint of a PCM WAV
  * payload; the audio near-dup key ([[graft.dedup.Dedup]]'s
  * audioNearDupPairs bands it for the Hamming pigeonhole join exactly
  * like the image dHash). */
case class MediaAudioFp(child: Expression, kernel: MediaKernel)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument 1 of $prettyName requires binary, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(p: Any): Any =
    kernel.audioFp(p.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("mediaKernel", kernel, classOf[MediaKernel].getName)
    nullSafeCodeGen(ctx, ev, p => s"${ev.value} = $k.audioFp($p);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "media_audio_fp"
}

case class MediaVideoFixture(child: Expression, kernel: MediaKernel)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument 1 of $prettyName requires bigint, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullSafeEval(id: Any): Any =
    kernel.videoFixture(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("mediaKernel", kernel, classOf[MediaKernel].getName)
    nullSafeCodeGen(ctx, ev, id => s"${ev.value} = $k.videoFixture($id);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "media_video_fixture"
}

/** `media_video_fp(payload)` — aligned per-sampled-frame dHash array of a
  * Y4M clip; the video near-dup key ([[graft.dedup.Dedup]]'s
  * videoNearDupPairs bands slot 0 for the Hamming pigeonhole join and
  * verifies every aligned slot). */
case class MediaVideoFp(child: Expression, kernel: MediaKernel)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument 1 of $prettyName requires binary, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(p: Any): Any =
    kernel.videoFp(p.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("mediaKernel", kernel, classOf[MediaKernel].getName)
    nullSafeCodeGen(ctx, ev, p => s"${ev.value} = $k.videoFp($p);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "media_video_fp"
}

object MediaExpressions {
  /** Catalyst type of the decoded metadata struct (field order matches
    * [[graft.multimodal.Multimodal.MediaMeta]]). */
  val MetaType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("nFrames", IntegerType, nullable = false),
    StructField("sizeBytes", LongType, nullable = false)))

  private val kernel = new MediaKernel

  def fixture(id: Column): Column =
    ColumnBridge.column(MediaFixture(
      ColumnBridge.expression(id.cast("long")), kernel))

  def decode(payload: Column): Column =
    ColumnBridge.column(MediaDecode(ColumnBridge.expression(payload), kernel))

  def dhash(payload: Column): Column =
    ColumnBridge.column(MediaDhash(ColumnBridge.expression(payload), kernel))

  def audioFp(payload: Column): Column =
    ColumnBridge.column(MediaAudioFp(ColumnBridge.expression(payload), kernel))

  def videoFixture(id: Column): Column =
    ColumnBridge.column(MediaVideoFixture(
      ColumnBridge.expression(id.cast("long")), kernel))

  def videoFp(payload: Column): Column =
    ColumnBridge.column(MediaVideoFp(ColumnBridge.expression(payload), kernel))
}
