package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.search.VectorSearch

/** Random-hyperplane (sign) LSH for cosine ANN — the bucketed scale path
  * complementing [[Ivf]]: no training pass at all, buckets are pure
  * expressions over the vector, so ingest-time bucketing costs one narrow
  * projection and the bucket column can partition the storage layout
  * exactly like the IVF cluster id (probe → partition pruning).
  *
  * Hyperplanes are derived from a seed via a splitmix64-style integer mix —
  * deterministic closed form, identical on any executor, nothing to
  * broadcast but the seed.
  *
  * Search probes the query's bucket plus all buckets within Hamming
  * distance 1 (sign flips near a hyperplane are the dominant error mode),
  * then runs the exact operator inside the probed subset. Recall is gated
  * in ScalaTest like the other approximate operators.
  */
object LshAnn {

  /** splitmix64 mix of (seed, plane, dim) → uniform double in [-1, 1). */
  private def mixedUnit(seed: Long, plane: Int, d: Int): Double = {
    var z = seed + 0x9e3779b97f4a7c15L * (plane.toLong * 131071L + d.toLong + 1L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  def hyperplanes(numBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(numBits)(p => Array.tabulate(dim)(d => mixedUnit(seed, p, d)))

  /** Bucket id column: bit b set iff vec · plane_b > 0. Uses the custom
    * loop-codegen'd cosine expression rather than an unrolled per-dim sum:
    * the sign of cosine equals the sign of the dot (norms are positive,
    * zero-norm guard yields 0 → bit unset, same as dot = 0), and the
    * unrolled form at numBits × dim = 4 × 64 blew past janino's method
    * limit — the whole stage then fell back to INTERPRETED eval, the
    * silent codegen failure mode PLANS.md exists to catch. */
  def bucketCol(vecCol: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, b) =>
      when(graft.GraftExtensions.cosineSim(vecCol, array(p.map(lit).toSeq: _*)) > 0.0,
        lit(1 << b)).otherwise(lit(0))
    }.reduceLeft[Column](_ + _)

  def withBuckets(df: DataFrame, vecCol: String, planes: Array[Array[Double]]): DataFrame =
    df.withColumn("lsh_bucket", bucketCol(col(vecCol), planes))

  /** Query-side probe set: own bucket + Hamming-1 neighbors. */
  def probeBuckets(query: Seq[Double], planes: Array[Array[Double]]): Seq[Int] = {
    val qb = planes.zipWithIndex.map { case (p, b) =>
      val dot = p.toSeq.zip(query).map { case (x, y) => x * y }.sum
      if (dot > 0.0) 1 << b else 0
    }.sum
    qb +: planes.indices.map(b => qb ^ (1 << b))
  }

  /** Approximate top-k: probe buckets, exact search within. */
  def search(bucketed: DataFrame, planes: Array[Array[Double]], query: Seq[Double],
      topK: Int, vecCol: String = "vector", idCol: String = "id"): DataFrame = {
    val probes = probeBuckets(query, planes)
    val pruned = bucketed.where(col("lsh_bucket").isin(probes: _*))
    VectorSearch.bruteForceTopK(pruned, query, topK, None, vecCol, idCol)
  }
}
