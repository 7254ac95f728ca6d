package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.search.VectorSearch

/** Exact search operator semantics (S1/S4/S5/S6). */
class SearchSpec extends SparkSpec {

  lazy val data = VectorModel.lineitemVectors(spark, Sf0001).cache()

  test("brute-force top-k returns k rows, sorted desc with id tie-break") {
    val res = VectorSearch.bruteForceTopK(data, VectorModel.Query, 10).collect()
    assert(res.length === 10)
    val sims = res.map(_.getAs[Double]("sim"))
    assert(sims.sameElements(sims.sortBy(-_)))
  }

  test("filtered search = filter-then-rank (exact, subset property)") {
    val pred = col("category") === "R"
    val filtered = VectorSearch.bruteForceTopK(data, VectorModel.Query, 10, Some(pred))
    val rows = filtered.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("category") == "R"))
    // every filtered hit must score <= the unfiltered top-1
    val bestAll = VectorSearch.bruteForceTopK(data, VectorModel.Query, 1)
      .collect()(0).getAs[Double]("sim")
    assert(rows.forall(_.getAs[Double]("sim") <= bestAll))
  }

  test("batch search equals per-query single search") {
    val queries = VectorModel.partQueries(spark, Sf0001).collect()
    val batch = VectorSearch.batchTopK(data, VectorModel.partQueries(spark, Sf0001),
      VectorModel.Dim, 3).collect()
    queries.foreach { qRow =>
      val qid = qRow.getLong(0)
      val qvec = qRow.getSeq[Double](1)
      val single = VectorSearch.bruteForceTopK(data, qvec, 3)
        .collect().map(_.getAs[Long]("id")).toSeq
      val fromBatch = batch.filter(_.getAs[Long]("query_id") == qid)
        .sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("id")).toSeq
      assert(fromBatch === single, s"query $qid")
    }
  }

  test("aggregator top-k equals window top-k row for row") {
    val agg = VectorSearch.batchTopK(data, VectorModel.partQueries(spark, Sf0001),
      VectorModel.Dim, 3).orderBy("query_id", "rn").collect().map(_.toSeq).toSeq
    val win = VectorSearch.batchTopKWindow(data, VectorModel.partQueries(spark, Sf0001), 3)
      .orderBy("query_id", "rn").collect().map(_.toSeq).toSeq
    assert(agg === win)
  }

  test("get_by_id returns exactly the requested record") {
    val someId = data.orderBy("id").limit(1).collect()(0).getLong(0)
    val res = VectorSearch.getById(data, someId).collect()
    assert(res.length === 1)
    assert(res(0).getAs[Long]("id") === someId)
    assert(VectorSearch.getById(data, -1L).count() === 0)
  }

  test("keyword predicate is case-insensitive substring with OR semantics") {
    val docs = VectorModel.documents(spark, Sf0001)
    val kw = VectorSearch.keywordPredicate(col("text"), Seq("WINDOW", "stream"))
    val hits = docs.where(kw)
    assert(hits.count() > 0)
    assert(hits.where(!(lower(col("text")).contains("window") ||
      lower(col("text")).contains("stream"))).count() === 0)
  }

  test("driver flagship entry returns rows (t1 smoke contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
    // every registered query has either an oracle or is a known rows-only op
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rag_e2e is IVF-backed (k-means — approximate like every ivf path);
    // ann_bin_batch_topk is the batch==single spec-gated twin of the
    // hash-gated ann_bin_topk; bpe_corpus_vocab is the iterative-argmax
    // BPE trainer (BpeSpec value-gates it; tx_bpe_stats carries the oracle)
    assert(rowsOnly.forall(n =>
      n.contains("hnsw") || n.contains("ivf") || n.contains("lsh") ||
        n.contains("pq") || n.contains("approx") || n.contains("rag_e2e") ||
        n.contains("bin_batch") || n.contains("bpe_corpus_vocab")),
      s"unexpected rows-only queries: $rowsOnly")
    // every oracle key has a matching query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("IVF search over the persisted clustered layout equals the in-memory path") {
    val stored = graft.queries.ApproxQueries.ivfStoredTopK(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val mem = graft.queries.ApproxQueries.ivfTopK(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(stored === mem)
    assert(stored.nonEmpty)
  }
}
