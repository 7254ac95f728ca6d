package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization as a BROADCAST-merge-table kernel —
  * the executor half of [[graft.text.Bpe]].
  *
  * The merge list ships ONCE per executor as a TorrentBroadcast (the
  * expression serializes only the broadcast handle into the task binary),
  * so the plan is O(1) in the number of learned merges — the same
  * argument as [[CjkFmmKernel]]: a learned vocabulary inlined as
  * expression literals would grow the plan with the model. The per-word
  * walk is [[graft.text.Bpe.Encoder]] (the SAME class the driver-side
  * `BpeModel.encodeWord` uses — one implementation, no drift risk): a
  * pair→rank map + lowest-rank-adjacent-pair heap merge, O(|w| log |w|)
  * per word independent of merge count, token-identical to the
  * rank-order reference walk for self-consistent trained lists and
  * falling back to it otherwise.
  *
  * Corpora repeat words heavily, so the kernel additionally memoizes
  * encodings per word in a bounded per-task map — the amortized cost per
  * row is a hash lookup per word. */
final class BpeKernel(merges: Broadcast[IndexedSeq[(String, String)]])
    extends Serializable {

  /** Materialized lazily per executor (not serialized with the task). */
  @transient private lazy val encoder: graft.text.Bpe.Encoder =
    new graft.text.Bpe.Encoder(merges.value)

  /** Per-task encode memo (tasks are single-threaded; the reference
    * object is instantiated per generated class). Bounded: cleared
    * wholesale if a pathological corpus exceeds the cap. */
  @transient private lazy val cache =
    new java.util.HashMap[String, Array[UTF8String]]()
  private val CacheCap = 1 << 16

  def encode(t: UTF8String): ArrayData = {
    val w = t.toString
    var hit = cache.get(w)
    if (hit == null) {
      hit = encoder.encode(w).map(UTF8String.fromString).toArray
      if (cache.size >= CacheCap) cache.clear()
      cache.put(w, hit)
    }
    new GenericArrayData(hit.asInstanceOf[Array[Any]])
  }
}

/** `bpe_encode(word)` — encode one whitespace word against the broadcast
  * merge table; plan size is O(1) in the model. */
case class BpeEncodeWord(child: Expression, kernel: BpeKernel)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument 1 of $prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    kernel.encode(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("bpeKernel", kernel, classOf[BpeKernel].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $k.encode($t);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "bpe_encode"
}

object BpeExpressions {
  def encode(word: Column, kernel: BpeKernel): Column =
    ColumnBridge.column(BpeEncodeWord(ColumnBridge.expression(word), kernel))
}
