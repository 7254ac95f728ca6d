package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.search.VectorSearch

/** MMR diversified top-k and range search ([[graft.search.VectorSearch]]).
  * Both are also DuckDB-hash-gated (`vq_mmr_topk` with the unrolled-greedy
  * CTE oracle, `vq_range_topk`); these tests pin the semantic properties
  * directly. */
class MmrSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("id", "vector")

  test("first MMR pick is the exact top-1; results are distinct pool members") {
    val data = VectorModel.lineitemVectors(spark, Sf0001)
    val mmr = VectorSearch.mmrTopK(data, VectorModel.Query, k = 5, poolSize = 50).collect()
    val top1 = VectorSearch.bruteForceTopK(data, VectorModel.Query, 1)
      .select("id").collect()(0).getLong(0)
    assert(mmr.length == 5)
    assert(mmr(0).getAs[Long]("id") == top1)
    assert(mmr.map(_.getAs[Long]("id")).distinct.length == 5)
    assert(mmr.map(_.getAs[Long]("mmr_rank")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("MMR skips a near-duplicate of the first pick that plain top-k keeps") {
    val q = Seq(1.0, 0.0)
    // ids 1,2 nearly identical and most relevant; id 3 slightly less
    // relevant but on the other side of the query — diverse from id 1.
    // Plain top-2 = {1,2}; MMR top-2 = {1,3}. (The picks must not be
    // query-aligned: for a selected vector equal to q, the λ=0.5 score
    // collapses to (sim − sim)/2 = 0 for every candidate.)
    val data = df(Seq(
      1L -> Seq(0.9, 0.43),
      2L -> Seq(0.9, 0.432),
      3L -> Seq(0.9, -0.45),
      4L -> Seq(0.0, 1.0)))
    val plain = VectorSearch.bruteForceTopK(data, q, 2)
      .select("id").collect().map(_.getLong(0)).toSet
    val mmr = VectorSearch.mmrTopK(data, q, k = 2, poolSize = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(plain == Set(1L, 2L))
    assert(mmr == Set(1L, 3L))
  }

  test("lambda=1 degenerates to the exact top-k order") {
    val data = VectorModel.lineitemVectors(spark, Sf0001)
    val mmr = VectorSearch.mmrTopK(data, VectorModel.Query, k = 5, poolSize = 50,
      lambda = 1.0).select("id").collect().map(_.getLong(0)).toSeq
    val exact = VectorSearch.bruteForceTopK(data, VectorModel.Query, 5)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(mmr == exact)
  }

  test("range search returns exactly the rows clearing the bar, ordered") {
    val data = VectorModel.lineitemVectors(spark, Sf0001)
    val got = VectorSearch.rangeSearch(data, VectorModel.Query, 0.9995)
      .select("id", "sim").collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getDouble(1) >= 0.9995))
    // ordered (sim desc, id asc)
    val pairs = got.map(r => (-r.getDouble(1), r.getLong(0))).toSeq
    assert(pairs == pairs.sorted)
    // completeness: count matches an independent filter on the full scan
    val expected = data
      .withColumn("sim", round(graft.functions.VectorFunctions.cosineConst(
        col("vector"), VectorModel.Query), 6))
      .where(col("sim") >= 0.9995).count()
    assert(got.length.toLong == expected)
  }

  test("grouped top-k returns k best per group with in-group ranking") {
    val data = VectorModel.lineitemVectors(spark, Sf0001)
      .withColumn("sim_raw", graft.functions.VectorFunctions.cosineConst(
        col("vector"), VectorModel.Query))
    val got = operators.TopK.perGroupTopK(data, "category", col("id"), col("sim_raw"), 3)
      .collect()
    val cats = data.select("category").distinct().count()
    assert(got.length.toLong == 3 * cats)
    got.groupBy(_.getAs[String]("category")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rn")).sorted.toSeq == Seq(1L, 2L, 3L))
      val sims = rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("sim")).toSeq
      assert(sims == sims.sorted.reverse)
    }
  }
}
