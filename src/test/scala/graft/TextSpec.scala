package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.text.Bm25

/** Properties of the BM25 ranking (the oracle gate covers value equality;
  * these check the ranking semantics hold on their own terms). */
class TextSpec extends SparkSpec {

  lazy val docs = VectorModel.documents(spark, Sf0001).cache()

  test("BM25 top-k: scores descend, ties break by id, all hits contain a query term") {
    val terms = Seq("vector", "spark", "join")
    val res = Bm25.topK(docs, terms, 10).collect()
    assert(res.nonEmpty)
    val scores = res.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_)), "scores must be non-increasing")
    res.sliding(2).foreach {
      case Array(a, b) =>
        if (a.getDouble(1) == b.getDouble(1)) assert(a.getLong(0) < b.getLong(0))
      case _ =>
    }
    val hitIds = res.map(_.getLong(0)).toSet
    val withTerm = docs
      .where(terms.map(t => array_contains(split(lower(col("text")), " "), t)).reduce(_ || _))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hitIds.subsetOf(withTerm), "every hit must contain at least one query term")
  }

  test("BM25 favors the doc with more query-term occurrences, all else equal") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark spark spark filler filler filler"),
      (2L, "spark filler filler filler filler filler"),
      (3L, "filler filler filler filler filler filler"),
      (4L, "other words entirely present here now"))
      .toDF("doc_id", "text")
    val res = Bm25.topK(corpus, Seq("spark"), 4).collect()
    assert(res.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(res(0).getDouble(1) > res(1).getDouble(1))
  }
}
