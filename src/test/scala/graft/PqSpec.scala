package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.pq.ProductQuantizer

/** PQ tests mirroring the reference's compression demo
  * (examples/datawhale.py:36-63): code shape, compression ratio,
  * reconstruction error bound, roundtrip dims. */
class PqSpec extends SparkSpec {

  lazy val emb = VectorModel.embeddings(spark, Sf0001).cache()
  lazy val pq = ProductQuantizer.train(emb, "embedding", "vec_id", VectorModel.EmbDim)

  test("dim must divide into m subspaces") {
    intercept[IllegalArgumentException] { new ProductQuantizer(dim = 10, m = 8) }
  }

  test("codes have shape (n, m) bytes; ratio is 32x for d=64 float32") {
    val encoded = ProductQuantizer.encodeDf(emb, pq, "embedding").cache()
    assert(encoded.count() === emb.count())
    val badLen = encoded.where(octet_length(col("pq_code")) =!= pq.m).count()
    assert(badLen === 0)
    // d=64 float32 = 256 bytes -> m=8 byte codes: 32x (reference gets 64x at d=128)
    val ratio = (VectorModel.EmbDim * 4).toDouble / pq.m
    assert(ratio === 32.0)
  }

  test("reconstruction error is bounded and roundtrip preserves dim") {
    val decoded = ProductQuantizer.decodeDf(
      ProductQuantizer.encodeDf(emb, pq, "embedding"), pq)
    val stats = decoded.select(
      aggregate(zip_with(col("embedding").cast("array<double>"), col("vector_approx"),
        (a, b) => abs(a - b)), lit(0.0), (acc, x) => acc + x)
        ./(VectorModel.EmbDim.toDouble).as("mae"),
      size(col("vector_approx")).as("d"))
    val badDim = stats.where(col("d") =!= VectorModel.EmbDim).count()
    assert(badDim === 0)
    val meanMae = stats.agg(avg("mae")).collect()(0).getDouble(0)
    info(s"PQ mean abs reconstruction error = $meanMae")
    // a useless quantizer would sit near the data's own mean-abs scale
    val scale = emb.select(abs(element_at(col("embedding"), 1)).cast("double").as("a"))
      .agg(avg("a")).collect()(0).getDouble(0)
    assert(meanMae < scale, s"mae $meanMae should beat the trivial scale $scale")
  }

  test("ADC search over codes approximates the exact L2 ranking") {
    import graft.search.VectorSearch
    import graft.functions.VectorFunctions
    val encoded = ProductQuantizer.encodeDf(emb, pq, "embedding")
    val adc = ProductQuantizer.adcTopK(encoded, pq, VectorModel.AnnQuery, 20, "vec_id")
    // exact L2 ranking (ADC approximates L2, not cosine)
    val exact = emb.withColumn("negl2",
      -VectorFunctions.l2Cols(col("embedding").cast("array<double>"),
        array(VectorModel.AnnQuery.map(lit): _*), VectorModel.EmbDim))
      .orderBy(col("negl2").desc, col("vec_id").asc)
      .limit(20)
    val r = graft.harness.Recall.recallAtK(
      exact.select("vec_id"), adc.select("vec_id"), "vec_id")
    info(s"PQ-ADC recall@20 vs exact L2 = $r")
    assert(r >= 0.5)
  }

  test("stored-codes ADC serving equals fresh-encode ADC; serve scan reads codes, not vectors") {
    val served = queries.ApproxQueries.queries("ann_pq_adc_topk")(spark, Sf0001)
    val fresh = ProductQuantizer.adcTopK(
        ProductQuantizer.encodeDf(emb, pq, "embedding"), pq,
        VectorModel.AnnQuery, 20, "vec_id")
      .select("vec_id", "adc_score")
    assert(served.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      fresh.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // the serving plan must scan the persisted code table (m-byte codes),
    // never the raw vector column — the 32x byte reduction is the point
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("embedding"),
      "serve path must not touch the vector table:\n" + plan.take(3000))
    assert(plan.contains("pq_code"), plan.take(3000))
  }

  test("encode/decode are deterministic for a fixed seed") {
    val pq2 = ProductQuantizer.train(emb, "embedding", "vec_id", VectorModel.EmbDim)
    val v = emb.limit(1).collect()(0).getSeq[Float](1).map(_.toDouble).toArray
    assert(pq.encode(v).toSeq === pq2.encode(v).toSeq)
  }
}
