package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text → embedding seam, completing the reference's intended pipeline
  * (embed → insert → search: it downloads a GTE embedding model,
  * /root/reference/scripts/model_download.sh:1, but ships no embedding
  * code — SURVEY.md §0). A model-backed implementation would wrap its
  * inference behind this trait (as a `mapInPandas`/`mapPartitions` batch
  * stage, the [[graft.multimodal.Multimodal]] pattern for absent codecs);
  * the engine's plumbing — chunk → embed → index → search — is real and
  * gated either way via the deterministic [[HashEmbedder]]. */
trait TextEmbedder {
  def dim: Int

  /** ARRAY<DOUBLE> embedding (length [[dim]]) of a text column. */
  def embed(text: Column): Column
}

/** Deterministic feature-hashing embedder — the classic hashing-trick
  * projection: each lowercased whitespace token votes ±1 into the bucket
  * `md5_60(token) mod dim`, sign from an independent hash bit. Pure
  * codegen'd expressions (one md5 per token), and the md5 derivation is
  * DuckDB-mirrorable, so the embedding stage itself is VALUE-gated by the
  * driver oracle (`tx_embed`) — unusual for an "embedding model", and
  * exactly why the stub is hash-based rather than random. Near-duplicate
  * texts share most tokens, hence most votes, hence high cosine — enough
  * signal for retrieval plumbing tests at any scale. */
final class HashEmbedder(val dim: Int = 16) extends TextEmbedder {

  def embed(text: Column): Column = {
    // hash each token ONCE; a single codegen kernel pass accumulates all
    // dim components at once — O(tokens + dim) per row, where the previous
    // per-component `aggregate` chain re-scanned the hash array dim times
    // (invisible at dim=16, the embed stage's hot loop at model dims)
    val hs = transform(split(lower(text), " "), t => graft.dedup.Dedup.hash60(t))
    graft.functions.ModelExpressions.hashEmbed(hs, dim)
  }
}

/** The ONNX-style LOCAL-MODEL variant of the seam: learned weights live in
  * a FILE, not the code — the lifecycle a production embedding swap
  * follows (convert/train offline → [[LocalModelEmbedder.save]] →
  * [[LocalModelEmbedder.load]] → `embed`), which the reference implies but
  * never ships (it downloads a GTE model,
  * /root/reference/scripts/model_download.sh:1, with no embedding code).
  *
  * The model is a linear projection W (dim × featBuckets) over hashed
  * token-count features: `out = W · hashEmbed(tokens)`. Inference inlines
  * W into the plan as codegen'd literals (the centroid/codebook pattern —
  * small model state rides the plan, data never moves to the model) — one
  * [[graft.functions.ModelExpressions.hashEmbed]] kernel pass plus `dim`
  * codegen'd dot products per row, no UDF. A real transformer swap keeps
  * the identical save/load/embed surface with `embed` becoming a
  * `mapInPandas` batch stage (the [[graft.multimodal.Multimodal]] pattern
  * for absent native libs).
  *
  * Weights are quantized to 1/256 steps: features are integer vote counts
  * and dyadic-rational weights make every product and partial sum exactly
  * representable in binary floating point, so the projection's value is
  * independent of summation order — which is what lets the driver oracle
  * VALUE-gate a learned model end-to-end (`tx_embed_local`), not just
  * rows-count it. */
final class LocalModelEmbedder(val weights: Array[Array[Double]],
    val featBuckets: Int) extends TextEmbedder {
  require(weights.nonEmpty && weights.forall(_.length == featBuckets),
    s"weight matrix must be dim x featBuckets=$featBuckets")
  val dim: Int = weights.length

  def embed(text: Column): Column = {
    val hs = transform(split(lower(text), " "), t => graft.dedup.Dedup.hash60(t))
    val feat = graft.functions.ModelExpressions.hashEmbed(hs, featBuckets)
    array(weights.toSeq.map(row =>
      graft.GraftExtensions.dotProduct(feat, array(row.toSeq.map(lit): _*))): _*)
  }
}

object LocalModelEmbedder {

  /** Deterministic stand-in for trained weights (splitmix64-derived,
    * quantized to k/256 with k ∈ [−256, 256]) — what an offline training
    * job would produce, exactly reproducible for the oracle. */
  def seeded(dim: Int, featBuckets: Int, seed: Long = 7L): Array[Array[Double]] =
    Array.tabulate(dim, featBuckets)((i, j) => quantStep(seed, i, j) / 256.0)

  /** The integer numerator of weight (i, j) — shared by [[seeded]] and the
    * oracle-SQL literal generator so both sides print the same value. */
  def quantStep(seed: Long, i: Int, j: Int): Int = {
    var x = seed + i.toLong * 1000003L + j.toLong * 998244353L
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    (java.lang.Math.floorMod(x, 513L) - 256L).toInt
  }

  /** Persist the weight matrix as a sidecar (one comma-joined row per
    * line — the routing-sidecar format, via the Hadoop API so it lands on
    * the cluster-visible filesystem). */
  def save(spark: org.apache.spark.sql.SparkSession, path: String,
      weights: Array[Array[Double]]): Unit = {
    val (fs, p) = graft.store.Fs.pathFs(spark, path)
    val out = fs.create(p, true)
    try out.write(
      weights.map(_.mkString(",")).mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Restore an embedder from a persisted weight sidecar. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): LocalModelEmbedder = {
    val (fs, p) = graft.store.Fs.pathFs(spark, path)
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val w = txt.split("\n").filter(_.nonEmpty).map(_.split(",").map(_.toDouble))
    new LocalModelEmbedder(w, w.head.length)
  }
}
