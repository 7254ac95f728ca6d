package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.pq.{Opq, ProductQuantizer}

/** Gates the SPEC-GATED half of ann_opq_adc_topk — that the balanced
  * permutation is a real allocation (bijective, grouped, balanced) and
  * that it actually reduces quantization distortion where variance is
  * skewed, never increasing it materially elsewhere. Serving is
  * hash-gated via the permutation/codebook sidecars. */
class OpqSpec extends SparkSpec {

  private val M = 8

  test("balanced permutation: bijection, full subspaces, log-var balance") {
    val vars = Array.tabulate(64)(i => 0.01 + 0.001 * (i % 7))
    val perm = Opq.balancedPermutation(vars, M)
    assert(perm.sorted.toSeq === (0 until 64))
    val subDim = 64 / M
    val subLog = (0 until M).map(s =>
      (0 until subDim).map(j => math.log(vars(perm(s * subDim + j)))).sum)
    // contiguous split of the same variances, for comparison
    val contLog = (0 until M).map(s =>
      (0 until subDim).map(j => math.log(vars(s * subDim + j))).sum)
    assert(subLog.max - subLog.min <= contLog.max - contLog.min + 1e-9,
      "greedy allocation must balance at least as well as the contiguous split")
  }

  test("skewed variance: OPQ reconstruction strictly beats plain PQ") {
    import spark.implicits._
    // deterministic fixture with INDEPENDENT per-(row, dim) values (a
    // lattice formula makes dims collinear, where concentrating them in
    // one subspace is optimal — the known OPQ counter-case): splitmix-
    // style hash → uniform, first 8 dims at 10x spread — a contiguous PQ
    // split gives subspace 0 all the hard directions; the balanced
    // permutation spreads them over 8 codebooks
    def v(i: Int, d: Int): Double = {
      var z = i.toLong * 1000L + d + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      val base = ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble - 0.5
      if (d < 8) base * 10.0 else base
    }
    val rows = (0 until 2000).map(i =>
      (i.toLong, (0 until 64).map(d => v(i, d))))
    val df = rows.toDF("vec_id", "embedding").cache()
    def mse(pq: ProductQuantizer, perm: Array[Int]): Double = {
      val inv = new Array[Int](64)
      perm.zipWithIndex.foreach { case (j, p) => inv(j) = p }
      rows.map { case (_, emb) =>
        val p = perm.map(emb(_)).toArray
        val rec = pq.decode(pq.encode(p))
        (0 until 64).map(d => { val e = emb(d) - rec(inv(d)); e * e }).sum
      }.sum / rows.size
    }
    val ident = Array.tabulate(64)(identity)
    val plain = ProductQuantizer.train(df, "embedding", "vec_id", 64)
    val perm = Opq.balancedPermutation(
      Opq.dimVariances(df, "embedding", 64), M)
    val pdf = df.withColumn("pemb", Opq.permuteCol(col("embedding"), perm))
    val opq = ProductQuantizer.train(pdf, "pemb", "vec_id", 64)
    val (mPlain, mOpq) = (mse(plain, ident), mse(opq, perm))
    info(f"skewed-fixture MSE: plain=$mPlain%.5f opq=$mOpq%.5f")
    assert(perm.take(8).count(_ < 8) <= 1,
      "the high-variance dims must spread across subspaces, not stay together")
    assert(mOpq < mPlain * 0.9,
      s"OPQ must strictly beat plain PQ on skewed variance: $mOpq vs $mPlain")
    df.unpersist()
  }

  test("corpus: OPQ distortion never materially exceeds plain PQ; serve matches") {
    val emb = VectorModel.embeddings(spark, Sf0001).cache()
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val plain = ProductQuantizer.train(emb, "embedding", "vec_id",
      VectorModel.EmbDim)
    val perm = Opq.balancedPermutation(
      Opq.dimVariances(emb, "embedding", VectorModel.EmbDim), M)
    val pdf = emb.withColumn("pemb", Opq.permuteCol(col("embedding"), perm))
    val opq = ProductQuantizer.train(pdf, "pemb", "vec_id", VectorModel.EmbDim)
    def mse(pq: ProductQuantizer, p: Array[Int]): Double =
      rows.map { case (_, e) =>
        val x = p.map(e(_)).toArray
        val rec = pq.decode(pq.encode(x))
        x.indices.map(d => { val df0 = x(d) - rec(d); df0 * df0 }).sum
      }.sum / rows.length
    val ident = Array.tabulate(VectorModel.EmbDim)(identity)
    val (mPlain, mOpq) = (mse(plain, ident), mse(opq, perm))
    info(f"corpus MSE: plain=$mPlain%.6f opq=$mOpq%.6f")
    assert(mOpq <= mPlain * 1.05,
      s"OPQ must not materially increase distortion: $mOpq vs $mPlain")
    // serving path: ADC under the permuted query over freshly encoded
    // codes equals a driver-side recompute of the same walk
    val q = Opq.permuteQuery(VectorModel.AnnQuery, perm)
    val codes = ProductQuantizer.encodeDf(pdf, opq, "pemb")
      .select("vec_id", "pq_code")
    val got = ProductQuantizer.adcTopK(codes, opq, q, 5, "vec_id")
      .select("vec_id", "adc_score")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expect = rows.map { case (id, e) =>
      val code = opq.encode(perm.map(e(_)).toArray)
      val d = (0 until M).map { s =>
        val cent = opq.codebooks(s)(code(s) & 0xFF)
        (0 until opq.subDim).map { j =>
          val diff = q(s * opq.subDim + j) - cent(j); diff * diff
        }.sum
      }.sum
      // round BEFORE ranking — adcTopK orders by the 6-decimal rounded
      // score, and a raw-order rank can disagree at rounding collisions
      (id, BigDecimal(-d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, sc) => (-sc, id) }.take(5)
    assert(got.map(_._1).toSeq === expect.map(_._1).toSeq,
      s"ADC ranking mismatch: ${got.toSeq} vs ${expect.toSeq}")
    emb.unpersist()
  }
}
