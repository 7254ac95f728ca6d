package graft

import org.apache.spark.sql.functions._

import graft.search.MaxSim

/** MaxSim late interaction ([[graft.search.MaxSim]]): the per-facet max /
  * summed-facets semantics on hand-computable vectors. The corpus-level
  * query (`ann_maxsim_topk`) is hash-gated against DuckDB. */
class MaxSimSpec extends SparkSpec {

  private def df(rows: (Long, Seq[Double])*) =
    spark.createDataFrame(rows).toDF("id", "v")

  val q0 = Seq(1.0, 0.0, 0.0)
  val q1 = Seq(0.0, 1.0, 0.0)

  test("a doc matching every facet in different chunks beats a one-facet doc") {
    // doc 1: one chunk per facet; doc 2: two chunks, both only facet 0
    val chunks = df(
      1L -> Seq(2.0, 0.0, 0.0), 1L -> Seq(0.0, 3.0, 0.0),
      2L -> Seq(5.0, 0.0, 0.0), 2L -> Seq(4.0, 0.0, 0.0))
    val got = MaxSim.topK(chunks, Seq(q0, q1), 2, "id", "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 2.0), (2L, 1.0)))
  }

  test("one facet degenerates to best-chunk cosine") {
    val chunks = df(
      1L -> Seq(1.0, 1.0, 0.0), 1L -> Seq(1.0, 0.0, 0.0),
      2L -> Seq(0.0, 1.0, 1.0))
    val got = MaxSim.topK(chunks, Seq(q0), 2, "id", "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 1.0), (2L, 0.0)))
  }

  test("duplicate chunks do not change the score — max, not sum, per facet") {
    val once = df(1L -> Seq(1.0, 2.0, 0.0))
    val thrice = df(1L -> Seq(1.0, 2.0, 0.0), 1L -> Seq(1.0, 2.0, 0.0),
      1L -> Seq(1.0, 2.0, 0.0))
    val a = MaxSim.topK(once, Seq(q0, q1), 1, "id", "v").collect()(0).getDouble(1)
    val b = MaxSim.topK(thrice, Seq(q0, q1), 1, "id", "v").collect()(0).getDouble(1)
    assert(a == b)
  }

  test("zero-norm chunks score 0 on every facet (the reference guard)") {
    val chunks = df(1L -> Seq(0.0, 0.0, 0.0))
    val got = MaxSim.topK(chunks, Seq(q0, q1), 1, "id", "v")
      .collect()(0).getDouble(1)
    assert(got == 0.0)
  }
}
