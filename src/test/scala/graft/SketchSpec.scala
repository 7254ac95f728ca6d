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

  test("Count-Min: zero undercount, εn overcount bound at sketch confidence") {
    // the classic CM contract: est >= exact ALWAYS (counters only add),
    // and est <= exact + εn with ε = e/w, each key independently with
    // probability >= 1 - e^-depth (~95% at depth 3) — gate the violating
    // fraction at the contract's failure budget, not per key
    val est = AnalyticsQueries.cmUserEstimates(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = spark.read.parquet(s"$Sf001/events.parquet").count()
    val epsN = math.E / AnalyticsQueries.CmWidth * n
    est.foreach { case (u, e, x) =>
      assert(e >= x, s"user $u: UNDERCOUNT est $e < exact $x — structurally impossible")
    }
    val over = est.count { case (_, e, x) => e - x > epsN }
    val budget = math.exp(-AnalyticsQueries.CmDepth) * est.length
    assert(over <= math.ceil(budget * 2).toInt,
      s"$over of ${est.length} keys exceed the εn=$epsN overcount bound " +
        s"(contract budget ~${budget.round})")
    info(s"CM overcount: $over/${est.length} keys past εn=${epsN.round} " +
      s"(max over ${est.map { case (_, e, x) => e - x }.max})")
    // the top-20 query is a deterministic cut of the same estimates
    val top = AnalyticsQueries.heavyHitters(spark, Sf001).collect()
    assert(top.length == 20)
    val expected = est.sortBy { case (u, e, _) => (-e, u) }.take(20).map(_._1).toSeq
    assert(top.map(_.getLong(0)).toSeq === expected)
  }

  test("quantile sketch: sampled p50/p95 land near the exact ranks") {
    // rank check: the exact CDF evaluated at the sampled quantile must sit
    // within the binomial sampling error of the target rank (s = 256 →
    // sd ≈ 0.031 at p50; gate at ~3σ)
    val sk = AnalyticsQueries.quantileSketch(spark, Sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(sk.nonEmpty)
    val ev = spark.read.parquet(s"$Sf001/events.parquet")
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    sk.foreach { case (t, ns, p50, p95) =>
      val vals = ev(t)
      assert(ns == math.min(AnalyticsQueries.QsSampleSize, vals.length).toLong)
      def cdf(x: Double): Double = vals.count(_ <= x).toDouble / vals.length
      assert(math.abs(cdf(p50) - 0.5) <= 0.10,
        s"$t: sampled p50=$p50 sits at exact rank ${cdf(p50)}")
      assert(math.abs(cdf(p95) - 0.95) <= 0.05,
        s"$t: sampled p95=$p95 sits at exact rank ${cdf(p95)}")
      info(f"$t: p50 rank ${cdf(p50)}%.3f, p95 rank ${cdf(p95)}%.3f (n_sampled $ns)")
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

  test("KMV set sketch: union/intersection estimates within sampling error") {
    // k = 256 -> union estimate sd ≈ 1/√k ≈ 6.25%; gate each pair's union
    // at ~3σ (20%) and intersection — whose c/k resemblance adds binomial
    // noise on a ~0.2 jaccard — at a wider 35%, plus the mean across the
    // ten pairs at ~1σ each. The estimator BRANCH must be the one
    // serving: the fixture's activity sets (~260 at sf0.001) exceed k.
    val rows = AnalyticsQueries.kmvSets(spark, Sf001).collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6)))
    assert(rows.length === 10) // 5 types choose 2
    val (uErrs, iErrs) = rows.map { case (a, b, eu, ei, ej, xu, xi) =>
      assert(xu > AnalyticsQueries.KmvK,
        s"$a-$b: fixture union $xu under k — exact branch, estimator untested")
      val ru = math.abs(eu - xu) / xu.toDouble
      val ri = math.abs(ei - xi) / xi.toDouble
      assert(ru <= 0.20, s"$a-$b: est_union $eu vs exact $xu (rel $ru)")
      assert(ri <= 0.35, s"$a-$b: est_inter $ei vs exact $xi (rel $ri)")
      assert(ej >= 0.0 && ej <= 1.0)
      (ru, ri)
    }.unzip
    assert(uErrs.sum / uErrs.length <= 0.0625,
      f"mean union error ${uErrs.sum / uErrs.length}%.4f past 1σ")
    assert(iErrs.sum / iErrs.length <= 0.15,
      f"mean intersection error ${iErrs.sum / iErrs.length}%.4f")
    info(f"KMV: mean union err ${uErrs.sum / uErrs.length}%.4f, " +
      f"mean inter err ${iErrs.sum / iErrs.length}%.4f over ${rows.length} pairs")
    // deterministic: re-evaluation is value-identical (order-free sketch)
    val again = AnalyticsQueries.kmvSets(spark, Sf001).collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6)))
    assert(again.toSeq === rows.toSeq)
  }
}
