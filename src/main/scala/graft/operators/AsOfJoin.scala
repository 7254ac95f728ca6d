package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the most recent right row with
  * the same key and time ≤ the left row's time. Spark has no native ASOF
  * operator; the naive formulation (range-θ join + per-left max) explodes
  * to O(|L|·|R|) per key. This implementation is the sort-merge shape:
  *
  *   tag right rows side=0 and left rows side=1 → unionByName →
  *   one hash shuffle by key → sort within partition by (time, side, tie)
  *   → running `last(payload, ignoreNulls)` window → keep left rows.
  *
  * Cost: one shuffle per side and a per-key sort — the same price as a
  * regular sort-merge join, independent of time-range density. At equal
  * times the right row sorts first (≤ semantics); duplicate right rows at
  * the same (key, time) resolve to the greatest `tieBreak` value. Hot keys
  * can be pre-split by coarse time bucket (each bucket seeded with the
  * previous bucket's last right row) — noted for skewed deployments.
  */
object AsOfJoin {

  /** @param payloadCols right-side columns carried onto matching left rows
    * @param tieBreak    right-side column ordering duplicates at one (key, time)
    * @return left rows (inner: only those with a match) + payload columns */
  def asOfBackward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payloadCols: Seq[String],
      tieBreak: String): DataFrame = {
    val l = left
      .withColumn("_t", col(leftTime).cast("long"))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast("long"))
    val r = right
      .select((key +: rightTime +: payloadCols.distinct).map(col): _*)
      .withColumn("_t", col(rightTime).cast("long"))
      .withColumn("_side", lit(0))
      .withColumn("_tie", col(tieBreak).cast("long"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col("_t").asc, col("_side").asc, col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled
      .where(col("_side") === 1 && col(payloadCols.head).isNotNull)
      .drop("_t", "_side", "_tie", rightTime)
  }
}
