package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join — points joined to the intervals containing them.
  *
  * Spark plans a raw `p BETWEEN lo AND hi` condition as a broadcast
  * nested-loop join: O(|points|·|intervals|) comparisons and, past the
  * broadcast threshold, a cartesian product — neither survives scale. The
  * standard fix is banding: quantize the time axis into fixed-width bands,
  * explode each interval into the bands it covers, band each point, and
  * equi-join on (band + any equi keys) with the exact BETWEEN left as a
  * residual filter. The join becomes a plain hash/sort-merge join whose
  * work is O(|points| + Σ spans/bandWidth + true matches).
  *
  * Band width tuning: ≈ the typical interval span, so each interval lands
  * in O(1) bands; a point is in exactly one band, so no dedup is needed.
  * Values are assumed non-negative (epoch micros here); `div` is integral
  * floor division on that domain in both Spark and the DuckDB oracle.
  */
object RangeJoin {

  /** Join each point row to every interval row whose [loCol, hiCol]
    * (inclusive both ends) contains pointCol, optionally also matching on
    * equiKeys (pointDf column → intervalDf column). Output: all point
    * columns + all interval columns. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String, bandWidth: Long,
      equiKeys: Seq[(String, String)] = Nil): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    // Widen the point side before the fan-in join: the banded keys are
    // high-cardinality, so hash-widening by them is skew-free.
    val p = Par.widenBy(
        points.withColumn("_band", expr(s"$pointCol div $bandWidth")),
        (equiKeys.map(k => col(k._1)) :+ col("_band")): _*)
      .as("p")
    val i = intervals
      .withColumn("_band",
        explode(sequence(expr(s"$loCol div $bandWidth"), expr(s"$hiCol div $bandWidth"))))
      .as("i")
    val cond = (equiKeys.map { case (pk, ik) => col(s"p.$pk") === col(s"i.$ik") } :+
      (col("p._band") === col("i._band"))).reduce(_ && _) &&
      col(s"p.$pointCol").between(col(s"i.$loCol"), col(s"i.$hiCol"))
    p.join(i, cond)
      .drop(col("p._band"))
      .drop(col("i._band"))
  }

  /** Reference formulation (broadcast nested loop) — the correctness oracle
    * for [[pointInInterval]] in tests; do not use at scale. */
  def pointInIntervalNaive(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      equiKeys: Seq[(String, String)] = Nil): DataFrame = {
    val p = points.as("p")
    val i = intervals.as("i")
    val cond = (equiKeys.map { case (pk, ik) => col(s"p.$pk") === col(s"i.$ik") } :+
      col(s"p.$pointCol").between(col(s"i.$loCol"), col(s"i.$hiCol"))).reduce(_ && _)
    p.join(i, cond)
  }
}
