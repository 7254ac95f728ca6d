package graft.dedup

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, MinHashLSHModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Par

/** MLlib-backed approximate similarity join for near-dup detection — the
  * library path complementing the expression-level [[Dedup.lshCandidatePairs]]
  * (which is oracle-mirrorable md5 arithmetic; this one is the idiomatic
  * MLlib pipeline: HashingTF shingle features → MinHashLSH →
  * approxSimilarityJoin).
  *
  * Scale shape: approxSimilarityJoin explodes each row into its
  * numHashTables band hashes and equi-joins on (table, hash) — constant
  * fan-out per doc, the same O(n·bands) candidate structure as the custom
  * operator. Distances on candidates are exact Jaccard over the hashed
  * binary feature vectors (2^18 bins ⇒ shingle collisions are rare), so
  * the join is recall-gated in ScalaTest against the exact n-gram Jaccard
  * operator rather than a SQL oracle.
  */
object MllibLsh {

  /** Binary shingle-occurrence features for MinHash. */
  def shingleFeatures(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numFeatures: Int = 1 << 18): DataFrame = {
    val sh = Par.widen(df)
      .where(size(split(col(textCol), " ")) >= k)
      .select(col(idCol).as("doc"), Dedup.shingles(col(textCol), k).as("sh"))
    new HashingTF()
      .setInputCol("sh").setOutputCol("features")
      .setNumFeatures(numFeatures).setBinary(true)
      .transform(sh)
  }

  /** Seeded MinHashLSH model fit — a build-once artifact (the model is a
    * handful of hash coefficients; the fit's cost is scanning `feat` for
    * the input-dimension check), reused across every serving join exactly
    * like the layout builds ([[graft.queries.DedupQueries]] memoizes it as
    * a `build_*` step). */
  def fit(feat: DataFrame, numHashTables: Int = 8): MinHashLSHModel =
    new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
      .fit(feat)

  /** Serving half: the approximate similarity self-join with a FITTED
    * model over a PRECOMPUTED feature table. */
  def joinPairs(model: MinHashLSHModel, feat: DataFrame,
      threshold: Double = 0.5): DataFrame =
    // approxSimilarityJoin filters dist STRICTLY below the bound, which
    // would drop pairs at exactly the threshold; widen the bound by an
    // epsilon and re-apply the inclusive contract on the similarity.
    model.approxSimilarityJoin(feat, feat, 1.0 - threshold + 1e-9, "jaccard_dist")
      .where(col("datasetA.doc") < col("datasetB.doc"))
      .select(
        col("datasetA.doc").as("da"),
        col("datasetB.doc").as("db"),
        round(lit(1.0) - col("jaccard_dist"), 6).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
      .orderBy("da", "db")

  /** Near-dup pairs with estimated Jaccard ≥ threshold via MLlib
    * MinHashLSH (seeded). Output: (da, db, est_jaccard), da < db.
    * One-shot convenience composing [[shingleFeatures]] → [[fit]] →
    * [[joinPairs]]; repeated serving should memoize the first two. */
  def approxJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, numHashTables: Int = 8, k: Int = 3): DataFrame = {
    val feat = shingleFeatures(df, idCol, textCol, k)
    joinPairs(fit(feat, numHashTables), feat, threshold)
  }
}
