package graft

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.functions.call_function

import graft.functions.{CosineSimilarity, DotProduct, L2Distance}

/** Engine extensions, registered via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`): native codegen'd functions
  * callable from both SQL and the Column API.
  *
  *  - `cosine_sim(a, b)`: fused single-pass cosine similarity
  *    ([[CosineSimilarity]]) — the hot-path form for wide embedding columns.
  *  - `dot_product(a, b)` / `l2_distance(a, b)`: the other two metrics the
  *    engine's index math uses ([[graft.functions.DotProduct]],
  *    [[graft.functions.L2Distance]]) — exposed so a pure-SQL user can
  *    express any of the engine's scoring shapes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def binary(name: String,
      make: (org.apache.spark.sql.catalyst.expressions.Expression,
             org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression)(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    if (exprs.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name, "expectedNum" -> "2",
          "actualNum" -> exprs.length.toString, "docroot" -> ""))
    make(exprs(0), exprs(1))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      binary("cosine_sim", CosineSimilarity(_, _)) _))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      binary("dot_product", DotProduct(_, _)) _))
    ext.injectFunction((
      FunctionIdentifier("l2_distance"),
      new ExpressionInfo(classOf[L2Distance].getName, "l2_distance"),
      binary("l2_distance", L2Distance(_, _)) _))
  }
}

object GraftExtensions {
  /** Column API for the registered functions (session must carry
    * [[GraftExtensions]]). Casts inputs to ARRAY<DOUBLE>. */
  def cosineSim(a: Column, b: Column): Column =
    call_function("cosine_sim", a.cast("array<double>"), b.cast("array<double>"))

  def dotProduct(a: Column, b: Column): Column =
    call_function("dot_product", a.cast("array<double>"), b.cast("array<double>"))

  def l2Distance(a: Column, b: Column): Column =
    call_function("l2_distance", a.cast("array<double>"), b.cast("array<double>"))
}
