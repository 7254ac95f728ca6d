package graft

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.functions.call_function

import graft.functions.CosineSimilarity

/** Engine extensions, registered via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`): native codegen'd functions
  * callable from both SQL and the Column API.
  *
  *  - `cosine_sim(a, b)`: fused single-pass cosine similarity
  *    ([[CosineSimilarity]]) — the hot-path form for wide embedding columns.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
  }
}

object GraftExtensions {
  /** Column API for the registered function (session must carry
    * [[GraftExtensions]]). Casts inputs to ARRAY<DOUBLE>. */
  def cosineSim(a: Column, b: Column): Column =
    call_function("cosine_sim", a.cast("array<double>"), b.cast("array<double>"))
}
