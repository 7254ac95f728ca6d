package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.text.{BatchEmbedder, LocalModelEmbedder}

/** The batch-inference embedding path must be VALUE-IDENTICAL to the
  * plan-inlined codegen path on the same weights file — the equality that
  * proves the mapPartitions/batched-matmul execution pattern (the shape a
  * real transformer swap needs) computes the same model, so swapping the
  * lambdas for a forward pass is the ONLY remaining change. */
class BatchEmbedSpec extends SparkSpec {

  private val Dim = 8
  private val Buckets = 64

  test("batch-inference embedder equals the plan-inlined model on the same weights file") {
    val w = LocalModelEmbedder.seeded(Dim, Buckets)
    val dir = java.nio.file.Files.createTempDirectory("graft_batch_embed").toString
    LocalModelEmbedder.save(spark, s"$dir/w", w)
    val docs = VectorModel.documents(spark, Sf0001).select("doc_id", "text")

    val codegen = docs
      .select(col("doc_id"),
        new LocalModelEmbedder(w, Buckets).embed(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val batch = BatchEmbedder.embedPartitions(docs, "text", s"$dir/w", outCol = "e")
      .select("doc_id", "e")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

    assert(batch.keySet === codegen.keySet)
    assert(batch.nonEmpty)
    // exact equality, not tolerance: integer votes × dyadic-rational
    // weights make every product and partial sum exactly representable
    batch.foreach { case (id, v) => assert(v === codegen(id), s"doc $id") }
  }

  test("re-saving a model at the same path invalidates the per-JVM weights cache") {
    val dir = java.nio.file.Files.createTempDirectory("graft_batch_embed_inv").toString
    val docs = VectorModel.documents(spark, Sf0001)
      .select("doc_id", "text").limit(20)
    val w1 = LocalModelEmbedder.seeded(Dim, Buckets, seed = 1L)
    LocalModelEmbedder.save(spark, s"$dir/w", w1)
    val e1 = BatchEmbedder.embedPartitions(docs, "text", s"$dir/w", outCol = "e")
      .select("doc_id", "e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // overwrite IN PLACE with different weights — the cache key carries
    // (mtime, length), so the stale matrix must not serve
    val w2 = LocalModelEmbedder.seeded(Dim, Buckets, seed = 2L)
    LocalModelEmbedder.save(spark, s"$dir/w", w2)
    val e2 = BatchEmbedder.embedPartitions(docs, "text", s"$dir/w", outCol = "e")
      .select("doc_id", "e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val expect2 = docs
      .select(col("doc_id"),
        new LocalModelEmbedder(w2, Buckets).embed(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(e2 === expect2)
    assert(e1 !== e2)
  }

  test("the RAG capstone returns identical results on the batch-inference path (the flag)") {
    import graft.queries.PipelineQueries
    def run() = PipelineQueries.ragEndToEnd(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val codegen = run()
    spark.conf.set("spark.graft.rag.batchEmbed", "true")
    val batch = try run()
    finally spark.conf.unset("spark.graft.rag.batchEmbed")
    assert(batch === codegen)
    assert(batch.nonEmpty)
  }
}
