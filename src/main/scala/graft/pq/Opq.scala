package graft.pq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optimized product quantization, PARAMETRIC variant (OPQ-P): balance
  * the per-subspace variance mass by PERMUTING dimensions before the PQ
  * split, instead of learning a dense rotation. The permutation is the
  * eigenvalue-allocation step of Ge et al.'s OPQ — greedily assign
  * dimensions (highest variance first) to the subspace with the smallest
  * accumulated log-variance, so no subspace hoards the hard-to-quantize
  * directions and the per-subspace codebooks share the distortion load.
  *
  * Why a permutation and not the full learned rotation here: applying it
  * is an exact element REORDER — zero arithmetic — so the trained
  * artifact is 64 integers, encode/serve reuse [[ProductQuantizer]]
  * verbatim on the permuted arrays, and the DuckDB oracle mirrors the
  * whole serve bit-identically by indexing through the published
  * permutation sidecar (a float rotation would make every downstream sum
  * order-sensitive and engine-unstable). The variance statistic is one
  * aggregate pass (sample-boundable at 100 TB like every centering
  * statistic here); training stays spec-gated, serving is hash-gated. */
object Opq {

  /** Per-dimension variance of an array column — one aggregate pass. */
  def dimVariances(df: DataFrame, vecCol: String, dim: Int): Array[Double] = {
    val row = df.select((0 until dim).map(i =>
      var_samp(element_at(col(vecCol), i + 1).cast("double"))): _*).head
    Array.tabulate(dim)(i => if (row.isNullAt(i)) 0.0 else row.getDouble(i))
  }

  /** Eigenvalue allocation: `perm(p)` = the ORIGINAL dimension at
    * permuted position p, positions grouped by subspace (subspace s owns
    * positions [s·subDim, (s+1)·subDim)). Two deterministic candidate
    * allocations over the descending-variance order — the paper's greedy
    * (each dim to the non-full subspace with the smallest accumulated
    * log-variance; products balance ⇔ log sums balance) and a SNAKE deal
    * (boustrophedon round-robin) — and the one with the smaller log-sum
    * spread wins. The greedy is near-optimal when variances decay fast
    * (the eigenvalue case) but its capacity pressure bunches the tail
    * when they are near-uniform: once only one subspace has room it
    * swallows every remaining low-variance dim (measured spread 3.76 vs
    * the contiguous split's 0.47 on a period-7 profile); the snake is
    * immune to that and near-optimal for flat profiles. Ties break by
    * dimension then subspace index — fully deterministic. */
  def balancedPermutation(variances: Array[Double], m: Int): Array[Int] = {
    val dim = variances.length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val order = variances.zipWithIndex
      .sortBy { case (v, i) => (-v, i) }.map(_._2)
    // +1e-12: a zero-variance dim must not send a log sum to -inf
    def lv(d: Int) = math.log(variances(d) + 1e-12)
    def spread(members: Array[scala.collection.mutable.ArrayBuffer[Int]]) = {
      val sums = members.map(_.map(lv).sum)
      sums.max - sums.min
    }
    val greedy = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val logSum = Array.fill(m)(0.0)
    order.foreach { d =>
      val s = (0 until m).filter(greedy(_).length < subDim)
        .minBy(s => (logSum(s), s))
      logSum(s) += lv(d)
      greedy(s) += d
    }
    val snake = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    order.zipWithIndex.foreach { case (d, r) =>
      val lap = r / m
      val s = if (lap % 2 == 0) r % m else m - 1 - r % m
      snake(s) += d
    }
    val best = if (spread(greedy) <= spread(snake)) greedy else snake
    best.flatMap(_.sorted).toArray
  }

  /** The permuted vector — an exact element reorder, no arithmetic. */
  def permuteCol(vecCol: Column, perm: Array[Int]): Column =
    array(perm.map(j => element_at(vecCol, j + 1)).toIndexedSeq: _*)

  /** Permute a driver-side query the same way. */
  def permuteQuery(q: Seq[Double], perm: Array[Int]): Seq[Double] =
    perm.map(q(_)).toIndexedSeq
}
