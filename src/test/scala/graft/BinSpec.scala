package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.pq.BinaryQuantizer

/** 1-bit binary quantization ([[graft.pq.BinaryQuantizer]]): packed-word
  * layout, driver-pack == executor-pack equivalence, Hamming geometry, and
  * two-stage serving recall vs the exact scan. The value-level equality of
  * the serving query is the driver's DuckDB gate (`ann_bin_topk`); these
  * pin the properties the oracle can't see (word packing, recall). */
class BinSpec extends SparkSpec {

  lazy val emb = VectorModel.embeddings(spark, Sf001).cache()
  lazy val bq = BinaryQuantizer.fit(emb, "embedding", VectorModel.EmbDim)

  test("codes are ceil(dim/32) words and bits are the midrange signs") {
    val codes = BinaryQuantizer.encodeDf(emb, bq, "embedding", "vec_id")
    assert(codes.schema.fieldNames.toSeq ==
      "vec_id" +: (0 until bq.numWords).map(i => s"b$i"))
    // executor-side packing == driver-side packing on the same vectors
    val rows = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    codes.collect().foreach { r =>
      val expect = bq.pack(rows(r.getLong(0)))
      (0 until bq.numWords).foreach { w =>
        assert(r.getLong(w + 1) == expect(w),
          s"id ${r.getLong(0)} word $w: ${r.getLong(w + 1)} != ${expect(w)}")
      }
    }
  }

  test("packed words stay in [0, 2^32) — no sign-bit arithmetic on either engine") {
    val codes = BinaryQuantizer.encodeDf(emb, bq, "embedding", "vec_id")
    val bad = codes.where(
      (0 until bq.numWords).map(w =>
        col(s"b$w") < 0L || col(s"b$w") >= (1L << 32)).reduce(_ || _)).count()
    assert(bad == 0L)
  }

  test("hamming distance: zero to itself, dim to the complement") {
    val one = emb.limit(1)
    val codes = BinaryQuantizer.encodeDf(one, bq, "embedding", "vec_id")
    val v = one.select(col("embedding").cast("array<double>"))
      .collect()(0).getSeq[Double](0)
    assert(codes.select(bq.hammingExpr(bq.pack(v))).collect()(0).getLong(0) == 0L)
    // flip every coordinate across its threshold → all bits flip
    val flipped = v.indices.map(i => 2.0 * bq.centers(i) - v(i) +
      (if (v(i) == bq.centers(i)) 1.0 else 0.0))
    assert(codes.select(bq.hammingExpr(bq.pack(flipped))).collect()(0).getLong(0) ==
      VectorModel.EmbDim.toLong)
  }

  test("two-stage serving recalls most of the exact top-20") {
    val exact = search.VectorSearch
      .bruteForceTopK(emb, VectorModel.AnnQuery, 20, vecCol = "embedding", idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val codes = BinaryQuantizer.encodeDf(emb, bq, "embedding", "vec_id")
    val got = BinaryQuantizer.topK(codes, emb, bq, VectorModel.AnnQuery, 20,
        rerank = 100, "vec_id", "embedding")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.6, s"binary recall $recall < 0.6")
  }

  test("re-ranked sims are the exact cosine — the second stage adds no error") {
    val codes = BinaryQuantizer.encodeDf(emb, bq, "embedding", "vec_id")
    val served = BinaryQuantizer.topK(codes, emb, bq, VectorModel.AnnQuery, 20,
        rerank = 100, "vec_id", "embedding")
      .select("vec_id", "sim").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = emb.select(col("vec_id"),
        round(graft.functions.VectorFunctions.cosineConst(
          col("embedding"), VectorModel.AnnQuery), 6).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    served.foreach { case (id, s) => assert(s == exact(id), s"id $id") }
  }

  test("batch Hamming scan equals the single-query path for every query") {
    val codes = BinaryQuantizer.encodeDf(emb, bq, "embedding", "vec_id")
    val qs = graft.queries.ApproxQueries.annQueryBatch(8)
    val batch = BinaryQuantizer.batchTopK(codes, emb, bq, qs, 20,
      rerank = 100, "vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    qs.foreach { case (qid, q) =>
      val single = BinaryQuantizer.topK(codes, emb, bq, q, 20,
        rerank = 100, "vec_id", "embedding")
        .collect().zipWithIndex
        .map { case (r, i) => (r.getLong(0), r.getDouble(2), (i + 1).toLong) }
        .toSet
      assert(batch(qid) === single, s"query $qid")
    }
  }
}
