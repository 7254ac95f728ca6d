package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.index.{HnswIndex, LshAnn}
import graft.multimodal.Multimodal
import graft.pq.ProductQuantizer

/** Property-based tests (ScalaCheck) over the pure JVM components —
  * invariants the example-based specs cannot sweep. */
object PureProps extends Properties("graft.pure") {

  val dim = 16
  val vecGen: Gen[Array[Double]] =
    Gen.containerOfN[Array, Double](dim, Gen.choose(-10.0, 10.0))

  // fixed fitted quantizer for the PQ properties
  private val pqSample: Array[Array[Double]] = {
    val rng = new java.util.Random(5)
    Array.fill(500)(Array.fill(dim)(rng.nextDouble() * 4 - 2))
  }
  private val pq = new ProductQuantizer(dim, m = 4).fit(pqSample)

  property("pq roundtrip preserves dimension") = forAll(vecGen) { v =>
    pq.decode(pq.encode(v)).length == dim
  }

  property("pq encode is deterministic and code length is m") = forAll(vecGen) { v =>
    val a = pq.encode(v); val b = pq.encode(v)
    a.toSeq == b.toSeq && a.length == 4
  }

  property("pq reconstruction of a training point stays in data range") =
    forAll(Gen.choose(0, pqSample.length - 1)) { i =>
      pq.decode(pq.encode(pqSample(i))).forall(x => x >= -2.5 && x <= 2.5)
    }

  property("lsh probe set: own bucket + one flip each, all distinct, in range") =
    forAll(vecGen, Gen.choose(2, 8)) { (q, bits) =>
      val planes = LshAnn.hyperplanes(bits, dim)
      val probes = LshAnn.probeBuckets(q.toSeq, planes)
      probes.size == bits + 1 && probes.distinct.size == probes.size &&
        probes.forall(b => b >= 0 && b < (1 << bits))
    }

  property("frame sampling is bounded, increasing, and within range") =
    forAll(Gen.choose(1, 1000), Gen.choose(1, 64)) { (n, max) =>
      val s = Multimodal.sampleFrameIndices(n, max)
      s.length == math.min(n, max) &&
        s.zip(s.drop(1)).forall { case (a, b) => a < b } &&
        s.forall(i => i >= 0 && i < n)
    }

  property("hnsw: self-query returns the inserted vector first") =
    forAll(Gen.choose(20, 120), Gen.choose(0L, 1000L)) { (n, seed) =>
      val rng = new java.util.Random(seed)
      val idx = new HnswIndex(m = 8, efConstruction = 32, seed = seed)
      val vecs = Array.fill(n)(Array.fill(dim)(rng.nextDouble() + 0.1))
      vecs.zipWithIndex.foreach { case (v, i) => idx.insert(i.toLong, v) }
      val probe = rng.nextInt(n)
      val top = idx.search(vecs(probe), 1, 32)
      // cosine ties are possible in principle but not with continuous data
      top.nonEmpty && top.head._2 >= 0.9999999
    }

  property("hnsw: duplicate id insert is a no-op") =
    forAll(Gen.choose(5, 40)) { n =>
      val rng = new java.util.Random(n)
      val idx = new HnswIndex(m = 4, efConstruction = 16, seed = 1L)
      val vecs = Array.fill(n)(Array.fill(dim)(rng.nextDouble()))
      vecs.zipWithIndex.foreach { case (v, i) => idx.insert(i.toLong, v) }
      vecs.zipWithIndex.foreach { case (v, i) => idx.insert(i.toLong, v) }
      idx.size == n
    }
}
