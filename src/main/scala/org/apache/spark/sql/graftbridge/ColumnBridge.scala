package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's parameterized native expressions.
  *
  * Spark 4 removed the public `Column(expr)` constructor; the supported
  * seam for libraries registering STATELESS functions is
  * `SparkSessionExtensions.injectFunction` (which this repo uses for
  * `cosine_sim`/`dot_product`/`l2_distance`). Model-carrying expressions
  * ([[graft.functions.NearestCentroid]] and friends close over fitted
  * centroids/codebooks, which have no SQL literal form) can't go through
  * the function registry, so this one-liner — in an `org.apache.spark.sql`
  * subpackage to satisfy `private[sql]` — wraps them the same way Spark's
  * own `functions` object does internally. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
