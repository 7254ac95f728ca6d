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
