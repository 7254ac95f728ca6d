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

  property("lsh probe set: own bucket + flip rings, all distinct, in range") =
    forAll(vecGen, Gen.choose(2, 8), Gen.choose(1, 2)) { (q, bits, radius) =>
      val planes = LshAnn.hyperplanes(bits, dim)
      val probes = LshAnn.probeBuckets(q.toSeq, planes, radius)
      val expected = 1 + bits + (if (radius == 2) bits * (bits - 1) / 2 else 0)
      probes.size == expected && probes.distinct.size == probes.size &&
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
      // ef >= n: the beam never prunes, so search exhausts the REACHABLE
      // component. Inserts link bidirectionally, but degree-bounded
      // reverse-edge pruning can later cut a node's last inbound edge —
      // so "the graph is connected" holds only almost always, and the
      // self-match is genuinely probabilistic even at full ef: measured
      // counterexample (n=105, seed=535) strands node 38 with top-1
      // (94, 0.88). Exhaustive k=n retrieval tells the two apart: a
      // DISCONNECTED probe is absent at every rank (accepted here as the
      // known rare mode — the operator-level recall floor is RecallSpec's
      // contract); a REACHABLE probe not ranked first would be a real
      // beam-ordering bug and still fails.
      val top = idx.search(vecs(probe), 1, math.max(n, 32))
      val selfReachable = idx.search(vecs(probe), n, math.max(n, 32))
        .exists { case (id, sim) => id == probe.toLong && sim >= 0.9999999 }
      // cosine ties are possible in principle but not with continuous data
      top.nonEmpty && (!selfReachable || top.head._2 >= 0.9999999)
    }

  property("hnsw: tie order is total — duplicate vectors return the smallest ids whatever the insertion order") =
    forAll(Gen.choose(8, 40), Gen.choose(0L, 1000L)) { (n, seed) =>
      // n copies of ONE vector (every similarity ties at 1.0) inserted in
      // a seed-shuffled id order: the (sim, id)-total-ordered beam must
      // return the k SMALLEST ids in order, independent of the shuffle —
      // the round-15 determinism contract (pre-change, heap-internal pop
      // order among equal sims made this insertion-order dependent)
      val rng = new scala.util.Random(seed)
      val v = Array.fill(dim)(0.5)
      val ids = rng.shuffle((0 until n).toList)
      val idx = new HnswIndex(m = 4, efConstruction = 16, seed = 1L)
      ids.foreach(i => idx.insert(i.toLong, v.clone()))
      val k = math.min(5, n)
      // ef = 8 < n: the boundary EVICTION must engage (the beam cannot
      // just keep everything), and equal sims never early-terminate the
      // walk, so the kept set is exactly the 8 smallest ids
      val top = idx.search(v, k, efSearch = 8)
      top.map(_._1) == (0 until k).map(_.toLong) &&
        top.forall(_._2 >= 0.9999999)
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

  property("lloyd: deterministic, k centers of input dimension, assignments cover") =
    forAll(Gen.choose(20, 200), Gen.choose(2, 8)) { (n, k) =>
      val rng = new java.util.Random(n * 31 + k)
      val sample = Array.fill(n)(Array.fill(dim)(rng.nextDouble() * 6 - 3))
      val a = graft.index.Ivf.lloyd(sample, k, seed = 42L, maxIter = 5)
      val b = graft.index.Ivf.lloyd(sample.map(_.clone()), k, seed = 42L, maxIter = 5)
      a.length == k && a.forall(_.length == dim) &&
        a.zip(b).forall { case (x, y) => x.sameElements(y) }
    }

  property("lloyd: every centroid is within the sample's bounding box") =
    forAll(Gen.choose(20, 120)) { n =>
      val rng = new java.util.Random(n)
      val sample = Array.fill(n)(Array.fill(dim)(rng.nextDouble() * 10 - 5))
      val centers = graft.index.Ivf.lloyd(sample, 4, seed = 7L, maxIter = 6)
      (0 until dim).forall { d =>
        val lo = sample.map(_(d)).min; val hi = sample.map(_(d)).max
        centers.forall(c => c(d) >= lo - 1e-9 && c(d) <= hi + 1e-9)
      }
    }

  // fixed IVF model for the probe/assignment properties
  private val ivfCentroids: Array[Array[Double]] = {
    val rng = new java.util.Random(7)
    Array.fill(8)(Array.fill(dim)(rng.nextDouble() * 4 - 2))
  }
  private val ivfModel = graft.index.Ivf.IvfModel(ivfCentroids)

  property("ivf probeClusters: distinct, in range, min(n, k) of them") =
    forAll(vecGen, Gen.choose(1, 12)) { (q, n) =>
      val p = ivfModel.probeClusters(q.toSeq, n)
      p.distinct.size == p.size &&
        p.forall(i => i >= 0 && i < ivfCentroids.length) &&
        p.size == math.min(n, ivfCentroids.length)
    }

  private val uniformSizes: Map[Int, Long] =
    ivfCentroids.indices.map(_ -> 100L).toMap

  property("margin walk: probe list is a prefix of the similarity ranking, floored and capped") =
    forAll(vecGen, Gen.choose(0.0, 0.5), Gen.choose(1, 8)) { (q, margin, cap) =>
      val p = ivfModel.probeClustersByMargin(q.toSeq, uniformSizes,
        minCandidates = 1L, margin = margin, minProbes = 2, maxProbes = cap)
      val ranking = ivfModel.probeClusters(q.toSeq, ivfCentroids.length)
      p == ranking.take(p.size) &&
        p.size >= math.min(2, cap) && p.size <= cap
    }

  property("margin walk: widening the margin never shrinks the probe set (monotone)") =
    forAll(vecGen, Gen.choose(0.0, 0.3), Gen.choose(0.0, 0.3)) { (q, a, b) =>
      val lo = math.min(a, b); val hi = math.max(a, b)
      val pl = ivfModel.probeClustersByMargin(q.toSeq, uniformSizes, 1L, lo)
      val ph = ivfModel.probeClustersByMargin(q.toSeq, uniformSizes, 1L, hi)
      ph.size >= pl.size && pl == ph.take(pl.size)
    }

  property("margin walk: the mass guard extends past the margin when nearest clusters are tiny") =
    forAll(vecGen) { q =>
      val ranking = ivfModel.probeClusters(q.toSeq, ivfCentroids.length)
      // every cluster tiny -> the 350-candidate target needs 4 clusters of
      // 100 even with a zero margin (the skew guard the mass term exists for)
      val p = ivfModel.probeClustersByMargin(q.toSeq, uniformSizes,
        minCandidates = 350L, margin = 0.0, minProbes = 1)
      p.size >= 4 && p == ranking.take(p.size)
    }

  property("ivf nearestCentroid minimizes squared L2 over all centroids") =
    forAll(vecGen) { v =>
      def d2(a: Array[Double]) =
        a.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum
      val dc = d2(ivfCentroids(ivfModel.nearestCentroid(v.toSeq)))
      ivfCentroids.forall(o => dc <= d2(o) + 1e-12)
    }

  property("range banding: bands cover an interval exactly (membership <=> band match)") =
    forAll(Gen.choose(1L, 1000L), Gen.choose(0L, 100000L), Gen.choose(0L, 5000L),
      Gen.choose(0L, 100000L)) { (w, lo, span, p) =>
      val hi = lo + span
      val bands = (lo / w) to (hi / w)
      val inBand = bands.contains(p / w)
      val member = p >= lo && p <= hi
      // membership implies band match (no false negatives — the lossless side)
      !member || inBand
    }

  // the exact band layout Dedup.simhashPairs uses (maxHamming+1 contiguous
  // bit bands over 60 bits), replicated as pure arithmetic
  private def simhashBands(fp: Long, maxHamming: Int, bits: Int): Seq[Long] = {
    val nBands = maxHamming + 1
    val widths = Array.tabulate(nBands)(b => bits / nBands + (if (b < bits % nBands) 1 else 0))
    val starts = widths.scanLeft(0)(_ + _)
    (0 until nBands).map(b => (fp >>> starts(b)) & ((1L << widths(b)) - 1))
  }

  property("simhash pigeonhole banding: hamming <= maxHamming implies some band matches exactly") =
    forAll(
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(1, 12),
      Gen.containerOf[Set, Int](Gen.choose(0, 59))) { (raw, maxHamming, flipBits) =>
      val bits = 60
      val a = raw & ((1L << bits) - 1)
      // construct b at a KNOWN hamming distance by flipping a chosen bit set
      val flips = flipBits.take(maxHamming)
      val b = flips.foldLeft(a)((v, i) => v ^ (1L << i))
      val ba = simhashBands(a, maxHamming, bits)
      val bb = simhashBands(b, maxHamming, bits)
      // maxHamming differing bits cannot touch all maxHamming+1 bands
      ba.zip(bb).exists { case (x, y) => x == y }
    }

  // arbitrary unicode-ish text including the html-special characters and
  // pre-escaped entity fragments (the double-escape trap)
  private val htmlTextGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf("&", "<", ">", "\"", "'", " ", "\n"),
    1 -> Gen.oneOf("&amp;", "&lt;", "&gt;", "</p>", "<script>", "&amp;lt;")
  )).map(_.mkString)

  property("html escape/unescape are exact inverses on arbitrary text") =
    forAll(htmlTextGen) { s =>
      graft.text.HtmlText.unescapeStr(graft.text.HtmlText.escapeStr(s)) == s
    }

  property("html escape output never contains raw markup characters") =
    forAll(htmlTextGen) { s =>
      val e = graft.text.HtmlText.escapeStr(s)
      !e.contains('<') && !e.contains('>')
    }

  property("warc record bytes parse back to the same payload fields") =
    forAll(htmlTextGen, Gen.choose(0L, 1L << 40),
      Gen.oneOf("en", "de", "zh"), Gen.oneOf("web", "wiki")) { (text, id, lang, src) =>
      val rows = graft.sources.WarcSource.parseFile("prop.warc",
        graft.sources.WarcSource.recordBytes(id, text, lang, src))
      rows.size == 1 && {
        val r = rows.head
        r.getString(0) == s"<urn:graft:$id>" &&
          r.getString(4) == lang && r.getString(5) == src &&
          r.getString(6).contains(graft.text.HtmlText.escapeStr(text))
      }
    }
}
