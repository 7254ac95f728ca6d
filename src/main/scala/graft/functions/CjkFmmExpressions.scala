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

/** Forward-maximum-matching CJK segmentation as a BROADCAST-dictionary
  * kernel — the large-wordlist half of the
  * [[graft.text.TextAnalysis.cjkTokensDict]] seam.
  *
  * The literal-array FMM is the right plan for a small curated dictionary
  * (`array_contains` over a few dozen literals folds into codegen), but a
  * jieba-scale wordlist (~350k entries) inlined as expression literals
  * explodes the plan: every `isin`/`array_contains` candidate check would
  * carry the whole list, analysis cost grows with plan size, and the
  * generated code blows past janino limits. Here the dictionary ships ONCE
  * per executor as a TorrentBroadcast (the expression serializes only the
  * broadcast HANDLE into the task binary), and the per-row work is the
  * same greedy longest-match walk [[graft.text.TextAnalysis.fmmSegment]]
  * specifies — identical tokens on any dictionary, plan size independent
  * of dictionary size (CjkDictSpec asserts both).
  *
  * Each candidate check is an O(1) hash lookup; the walk mirrors
  * `fmmSegment` verbatim, including the clamp rule: the candidate at probe
  * length l is clamped at the token end, the emitted token is the clamped
  * candidate, and the step is the PROBED length. */
final class CjkFmmKernel(dict: Broadcast[Set[String]], val maxLen: Int)
    extends Serializable {

  /** Hash view of the broadcast wordlist, materialized lazily per executor
    * (not serialized with the expression). */
  @transient private lazy val words: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    dict.value.foreach(h.add)
    h
  }

  def segment(t: UTF8String): ArrayData = {
    val s = t.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < s.length) {
      var l = maxLen
      var step = 0
      while (step == 0 && l >= 2) {
        val w = s.substring(i, math.min(i + l, s.length))
        if (words.contains(w)) {
          out += UTF8String.fromString(w)
          step = l
        } else l -= 1
      }
      if (step > 0) i += step
      else {
        out += UTF8String.fromString(s.substring(i, i + 1))
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** `cjk_fmm(token)` — FMM-segment one CJK token against the broadcast
  * dictionary; plan size is O(1) in the dictionary. */
case class CjkFmmSegment(child: Expression, kernel: CjkFmmKernel)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument 1 of $prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    kernel.segment(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("cjkFmmKernel", kernel,
      classOf[CjkFmmKernel].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $k.segment($t);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "cjk_fmm"
}

object CjkFmmExpressions {
  def segment(token: Column, kernel: CjkFmmKernel): Column =
    ColumnBridge.column(CjkFmmSegment(ColumnBridge.expression(token), kernel))
}
