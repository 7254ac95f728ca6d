package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.pq.ScalarQuantizer

/** SQ8 scalar quantization ([[graft.pq.ScalarQuantizer]]): codec shape,
  * the nearest-level error bound, and serving accuracy vs the exact scan.
  * The hash equality of the serving query itself is the driver's DuckDB
  * gate (`ann_sq_topk`); these tests pin the properties the oracle can't
  * see (byte layout, bound tightness, recall). */
class SqSpec extends SparkSpec {

  lazy val emb = VectorModel.embeddings(spark, Sf0001).cache()
  lazy val sq = ScalarQuantizer.fit(emb, "embedding", VectorModel.EmbDim)

  test("codes are dim bytes per row — 8x vs double, 4x vs float32 storage") {
    val encoded = ScalarQuantizer.encodeDf(emb, sq, "embedding")
    val lens = encoded.select(length(col("sq_code"))).distinct().collect().map(_.getInt(0))
    assert(lens.toSeq == Seq(VectorModel.EmbDim))
  }

  test("reconstruction error per dimension is bounded by step/2") {
    val encoded = ScalarQuantizer.encodeDf(emb, sq, "embedding")
    val decoded = ScalarQuantizer.decodeDf(encoded, sq)
    val rows = decoded
      .select(col("embedding").cast("array<double>"), col("vector_approx"))
      .collect()
    // nearest-level quantization: |v − recon| ≤ step/2 (+ double ulps)
    rows.foreach { r =>
      val v = r.getSeq[Double](0)
      val a = r.getSeq[Double](1)
      (0 until VectorModel.EmbDim).foreach { i =>
        val bound = sq.steps(i) / 2.0 + 1e-12
        assert(math.abs(v(i) - a(i)) <= bound,
          s"dim $i: |${v(i)} - ${a(i)}| > $bound")
      }
    }
  }

  test("constant dimension encodes to 0 and reconstructs exactly") {
    val mins = Array(1.5, -2.0)
    val s = new ScalarQuantizer(mins, Array(1.5, 2.0)) // dim 0 constant
    val code = s.encode(Array(1.5, 0.0))
    assert(code(0) == 0)
    assert(s.decode(code)(0) == 1.5)
  }

  test("values at and beyond the fit range clamp to the edge codes") {
    val s = new ScalarQuantizer(Array(0.0), Array(1.0))
    assert((s.encode(Array(-5.0))(0) & 0xFF) == 0)
    assert((s.encode(Array(0.0))(0) & 0xFF) == 0)
    assert((s.encode(Array(1.0))(0) & 0xFF) == 255)
    assert((s.encode(Array(9.0))(0) & 0xFF) == 255)
  }

  test("quantized-cosine top-20 recalls the exact top-20 near-perfectly") {
    val exact = search.VectorSearch
      .bruteForceTopK(emb, VectorModel.AnnQuery, 20, vecCol = "embedding", idCol = "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val encoded = ScalarQuantizer.encodeDf(emb, sq, "embedding").select("vec_id", "sq_code")
    val got = ScalarQuantizer.adcTopK(encoded, sq, VectorModel.AnnQuery, 20, "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.9, s"SQ8 recall $recall < 0.9")
  }
}
