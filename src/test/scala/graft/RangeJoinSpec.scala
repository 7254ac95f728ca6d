package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Banded range join: equivalence with the nested-loop reference
  * formulation, edge inclusivity, and the no-nested-loop plan invariant. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val points = Seq(
    (1L, 10L, 5L), (2L, 10L, 100L), (3L, 10L, 101L), (4L, 20L, 0L),
    (5L, 20L, 250L), (6L, 30L, 999L), (7L, 10L, 100L)
  ).toDF("pid", "k", "t")

  private lazy val intervals = Seq(
    (100L, 10L, 0L, 100L), (101L, 10L, 100L, 200L), (102L, 20L, 0L, 49L),
    (103L, 20L, 200L, 300L), (104L, 40L, 0L, 1000L)
  ).toDF("iid", "ik", "lo", "hi")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").as[(Long, Long)].collect().toSet

  test("banded join matches the nested-loop reference on keyed intervals") {
    for (w <- Seq(7L, 50L, 1000L)) {
      val banded = RangeJoin.pointInInterval(points, intervals,
        "t", "lo", "hi", w, Seq("k" -> "ik"))
      val naive = RangeJoin.pointInIntervalNaive(points, intervals,
        "t", "lo", "hi", Seq("k" -> "ik"))
      assert(pairs(banded) == pairs(naive), s"bandWidth=$w")
    }
    // inclusive at both bounds: t=100 matches [0,100] and [100,200]
    val b = RangeJoin.pointInInterval(points, intervals, "t", "lo", "hi", 50L,
      Seq("k" -> "ik"))
    assert(pairs(b).contains((2L, 100L)) && pairs(b).contains((2L, 101L)))
  }

  test("banded join matches reference with no equi keys") {
    val banded = RangeJoin.pointInInterval(points, intervals, "t", "lo", "hi", 64L)
    val naive = RangeJoin.pointInIntervalNaive(points, intervals, "t", "lo", "hi")
    assert(pairs(banded) == pairs(naive))
  }

  test("banded join plans as an equi join, not a nested loop") {
    val p = RangeJoin.pointInInterval(points, intervals, "t", "lo", "hi", 50L,
      Seq("k" -> "ik")).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(2000))
  }

  test("ev_range_join query matches its oracle shape at sf0.001") {
    val df = graft.queries.AnalyticsQueries.eventsRangeJoinIncidents(spark, Sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every attributed order aggregates at least one event
    assert(rows.forall(_.getLong(1) >= 1L))
  }
}
