package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for wide aggregations — the hand-rolled complement to
  * AQE's skew-join splitting (which only covers joins).
  *
  * A `groupBy(key).agg(...)` over a power-law key lands the hottest key on
  * one reducer; at 100 TB that straggler dominates the stage. Salting
  * splits each key into `saltBuckets` sub-keys, aggregates partials in
  * parallel, then combines partials per real key — two small shuffles
  * instead of one skewed one. Only algebraic aggregates (sum/count/min/max)
  * compose this way; results are identical to the direct aggregation
  * (asserted in SkewSpec).
  */
object Skew {

  /** Salted sum/count aggregation: returns (key, sum(valueCol), count). */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: Column,
      saltBuckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(hash(col(keyCol), monotonically_increasing_id()), lit(saltBuckets)))
      .withColumn("_v", valueCol)
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col("_v")).as("_psum"), count(lit(1)).as("_pcnt"))
    partial
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as("sum"), sum(col("_pcnt")).as("n"))
  }
}
