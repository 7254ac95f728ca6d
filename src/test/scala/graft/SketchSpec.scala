package graft

import org.apache.spark.sql.functions._

import graft.queries.AnalyticsQueries

/** Sketch aggregates: HLL++ distinct estimate within its configured
  * relative error of the exact distinct; percentiles bounded by min/max
  * and ordered. */
class SketchSpec extends SparkSpec {

  test("approx distinct users is within 5% of exact per event type") {
    val approx = AnalyticsQueries.approxUsers(spark, Sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$Sf001/events.parquet")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, d) =>
      val a = approx(k)
      assert(math.abs(a - d).toDouble / d <= 0.05, s"$k: approx $a vs exact $d")
    }
  }

  test("percentiles are ordered and within the value range") {
    val rows = AnalyticsQueries.valuePercentiles(spark, Sf001).collect()
    assert(rows.nonEmpty)
    val (lo, hi) = {
      val r = spark.read.parquet(s"$Sf001/events.parquet")
        .agg(min("value"), max("value")).head
      (r.getDouble(0), r.getDouble(1))
    }
    rows.foreach { r =>
      val p50 = r.getDouble(1); val p95 = r.getDouble(2)
      assert(p50 <= p95 && p50 >= lo && p95 <= hi, r.toString)
    }
  }

  test("deterministic HLL: raw-regime accuracy and run-to-run identity") {
    // m = 16 registers -> standard error 1.04/sqrt(16) = 26%; at ~150
    // distinct users per type gate each estimate at 2 sigma and the mean
    // absolute error across the five types at ~1 sigma
    val rows = graft.queries.AnalyticsQueries.hllUsers(spark, Sf001)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(rows.length === 5)
    val errs = rows.map { case (t, e, x) =>
      val rel = math.abs(e - x) / x.toDouble
      assert(x > 2.5 * graft.queries.AnalyticsQueries.HllM,
        s"$t: fixture left the raw-estimate regime (n=$x)")
      assert(rel <= 0.52, s"$t: estimate $e vs exact $x (rel $rel)")
      rel
    }
    assert(errs.sum / errs.length <= 0.3,
      f"mean relative error ${errs.sum / errs.length}%.3f too high")
    // deterministic: a second evaluation is value-identical
    val again = graft.queries.AnalyticsQueries.hllUsers(spark, Sf001)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(again.toSeq === rows.toSeq)
  }
}
