package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.pq.Pca

/** Gates the SPEC-GATED half of ann_pca_topk — that the deterministic
  * power-iteration fit produces a usable orthonormal basis and that the
  * two-stage serve actually finds the exact neighbors (the semantic claim
  * the hash oracle, which mirrors arithmetic only, cannot make). */
class PcaSpec extends SparkSpec {

  private lazy val emb = VectorModel.embeddings(spark, Sf001)
  private lazy val model =
    Pca.fit(emb, "embedding", VectorModel.EmbDim, "vec_id")

  test("components are orthonormal, sign-canonical, variance-ordered") {
    val c = model.components
    assert(c.length === Pca.R)
    for (r <- 0 until Pca.R) {
      val n = math.sqrt(c(r).map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"component $r norm $n")
      val lead = c(r).indices.maxBy(i => (math.abs(c(r)(i)), -i))
      assert(c(r)(lead) > 0.0, s"component $r sign not canonical")
      for (p <- 0 until r) {
        val d = c(r).indices.map(i => c(r)(i) * c(p)(i)).sum
        assert(math.abs(d) < 1e-6, s"components $p,$r not orthogonal: $d")
      }
    }
    // spectral order survives into the projected corpus: variances of the
    // projection columns are non-increasing (small slack — the sample the
    // fit saw and the full corpus differ)
    val projected = emb
      .select(Pca.projectionCols(col("embedding"), model): _*)
    val vars = projected.select((0 until Pca.R).map(r =>
      var_samp(col(s"p$r")).as(s"v$r")): _*).head
    val vs = (0 until Pca.R).map(vars.getDouble)
    vs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a * 1.05, s"variance order violated: $vs")
    }
  }

  test("two-stage top-20 recalls the exact brute-force neighbors") {
    val got = graft.queries.ApproxQueries.queries("ann_pca_topk")(spark, Sf001)
      .collect().map(_.getLong(0)).toSet
    val exact = graft.search.VectorSearch.bruteForceTopK(
        emb, VectorModel.AnnQuery, 20, vecCol = "embedding", idCol = "vec_id")
      .collect().map(_.getLong(0)).toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"PCA two-stage recall $recall < 0.95 at sf0.01")
    info(f"PCA recall@20 = $recall%.2f at rerank ${graft.queries.ApproxQueries.PcaRerank}")
  }

  test("batch serve == single serve per query (the S4 parity contract)") {
    import graft.queries.ApproxQueries
    val batch = ApproxQueries.queries("ann_pca_batch_topk")(spark, Sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    // the single path with each batch query's vector, same layout + model
    val m = Pca.fit(emb, "embedding", VectorModel.EmbDim, "vec_id")
    val projected = emb.select(
      col("vec_id") +: Pca.projectionCols(col("embedding"), m): _*)
    batch.foreach { case (qid, got) =>
      val q = (0 until VectorModel.EmbDim)
        .map(i => ((i * 37 + 11 + qid * 13) % 101) / 101.0)
      val single = Pca.topK(projected, emb, m, q, 20,
        ApproxQueries.PcaRerank, "vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === single, s"query $qid: batch != single")
    }
  }

  test("deterministic: refit is value-identical; zero vector projects finitely") {
    val m2 = Pca.fit(emb, "embedding", VectorModel.EmbDim, "vec_id")
    assert(m2.mean.toSeq === model.mean.toSeq)
    assert(m2.components.map(_.toSeq).toSeq === model.components.map(_.toSeq).toSeq)
    val z = Pca.project(Seq.fill(VectorModel.EmbDim)(0.0), model)
    assert(z.forall(x => !x.isNaN && !x.isInfinite))
  }
}
