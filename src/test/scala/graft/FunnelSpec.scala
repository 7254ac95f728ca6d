package graft

import graft.queries.AnalyticsQueries

/** Funnel ordering semantics ([[graft.queries.AnalyticsQueries]]
  * funnelStages): stage N counts only strictly after stage N−1. The
  * corpus-level query (`ev_funnel`) is hash-gated, but the generated
  * events are dense enough that every user converts — these constructed
  * sequences prove the ordering constraint actually bites. */
class FunnelSpec extends SparkSpec {

  private def stages(rows: (Long, String, Long)*) =
    AnalyticsQueries.funnelStages(
      spark.createDataFrame(rows).toDF("user_id", "event_type", "tsu"),
      AnalyticsQueries.FunnelStages)
      .collect().map(r => r.getLong(0) ->
        (0 until 3).map(i => if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1))))
      .toMap

  test("the happy path records each stage's earliest qualifying time") {
    val got = stages(
      (1L, "view", 10L), (1L, "view", 5L), (1L, "click", 20L),
      (1L, "click", 7L), (1L, "purchase", 30L))
    // first view 5; first click after 5 is 7 (not 20); purchase 30
    assert(got(1L) == Seq(Some(5L), Some(7L), Some(30L)))
  }

  test("a click before the first view does not convert") {
    val got = stages((1L, "click", 3L), (1L, "view", 5L))
    assert(got(1L) == Seq(Some(5L), None, None))
  }

  test("a purchase before the qualifying click does not convert") {
    val got = stages(
      (1L, "view", 1L), (1L, "purchase", 2L), (1L, "click", 3L))
    assert(got(1L) == Seq(Some(1L), Some(3L), None))
  }

  test("simultaneous events do not satisfy the STRICTLY-after constraint") {
    val got = stages((1L, "view", 5L), (1L, "click", 5L), (1L, "purchase", 6L))
    assert(got(1L) == Seq(Some(5L), None, None))
  }

  test("users are independent — one row per user, stages never leak") {
    val got = stages(
      (1L, "view", 1L), (2L, "click", 2L), (2L, "view", 1L),
      (2L, "purchase", 3L), (2L, "click", 2L))
    assert(got(1L) == Seq(Some(1L), None, None))
    assert(got(2L) == Seq(Some(1L), Some(2L), Some(3L)))
    assert(got.size == 2)
  }
}
