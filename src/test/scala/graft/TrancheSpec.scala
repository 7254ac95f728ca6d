package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.queries.{AnalyticsQueries, DedupQueries, PipelineQueries}

/** Property gates for the round-11 tranche: span-coverage scrub,
  * deterministic shard shuffle, temperature mixing, cohort retention.
  * (Value-level parity vs DuckDB is the driver oracle's job; these pin the
  * semantic invariants the oracle can't express.) */
class TrancheSpec extends SparkSpec {
  import spark.implicits._

  test("spanCoverage: full overlap = 1.0, unique doc = 0, bounds hold") {
    val docs = Seq(
      (1L, "a b c d e f g h"),            // exactly one 8-gram, shared with doc 2
      (2L, "a b c d e f g h"),            // identical — both fully covered
      (3L, "q w e r t y u i o p"),        // unique text, no shared grams
      (4L, "x y")                         // shorter than k — zero grams
    ).toDF("doc_id", "text")
    val cov = Dedup.spanCoverage(docs, "doc_id", "text", k = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(cov(1L) === ((8L, 8L, 1.0)))
    assert(cov(2L) === ((8L, 8L, 1.0)))
    assert(cov(3L)._2 === 0L && cov(3L)._3 === 0.0)
    assert(cov(4L)._2 === 0L)
    cov.values.foreach { case (n, d, f) =>
      assert(d >= 0L && d <= n && f >= 0.0 && f <= 1.0)
    }
  }

  test("spanCoverage: partial overlap counts covered positions once") {
    // docs share the 8-gram "a b c d e f g h"; doc 1 has 2 extra lead tokens
    val docs = Seq(
      (1L, "z z a b c d e f g h"),
      (2L, "a b c d e f g h tail1 tail2")
    ).toDF("doc_id", "text")
    val cov = Dedup.spanCoverage(docs, "doc_id", "text", k = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cov(1L) === ((10L, 8L)))
    assert(cov(2L) === ((10L, 8L)))
  }

  test("spanScrubbedText: removes exactly the covered tokens, preserves order") {
    val docs = Seq(
      (1L, "z z a b c d e f g h"),           // shared 8-gram at pos 2..9
      (2L, "a b c d e f g h tail1 tail2"),   // shared 8-gram at pos 0..7
      (3L, "u n i q u e words only here now") // untouched
    ).toDF("doc_id", "text")
    val got = Dedup.spanScrubbedText(docs, "doc_id", "text", k = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L) === (("z z", 2L)))
    assert(got(2L) === (("tail1 tail2", 2L)))
    assert(got(3L) === (("u n i q u e words only here now", 10L)))
    // fully-covered doc comes back empty
    val full = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val g2 = Dedup.spanScrubbedText(full, "doc_id", "text", 8, 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(g2(1L) === (("", 0L)) && g2(2L) === (("", 0L)))
  }

  test("spanMaximalIntervals: overlapping windows merge to one maximal interval") {
    // docs 1+2 share a 10-token span: its seven 4-gram windows all
    // duplicate and must fuse into ONE interval of len 10, not seven
    val docs = Seq(
      (1L, "x1 x2 A B C D E F G H I J y1"),
      (2L, "A B C D E F G H I J"),
      (3L, "totally unrelated words here")
    ).toDF("doc_id", "text")
    val got = Dedup.spanMaximalIntervals(docs, "doc_id", "text", minLen = 4, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 10L), (2L, 0L, 10L)))
  }

  test("spanMaximalIntervals: nested shorter match stays inside the maximal interval") {
    // docs 1+2 share the long span; doc 3 shares only the nested "C D E F"
    // — the long interval must not split around the nested match, and doc
    // 3 reports exactly the 4-token interval
    val docs = Seq(
      (1L, "A B C D E F G H I J"),
      (2L, "A B C D E F G H I J"),
      (3L, "lead C D E F trail1 trail2")
    ).toDF("doc_id", "text")
    val got = Dedup.spanMaximalIntervals(docs, "doc_id", "text", minLen = 4, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 0L, 10L), (2L, 0L, 10L), (3L, 1L, 4L)))
  }

  test("spanMaximalIntervals: exactly-touching runs merge, wider gaps split") {
    // doc 1 = "A B C D E F G H": both 4-gram halves duplicate against doc
    // 2 but the straddling windows don't. In doc 1 the two runs touch
    // (starts 0 and 4, gap == L) -> ONE interval of len 8; in doc 2 the
    // same halves sit 5 apart -> TWO intervals of len 4
    val docs = Seq(
      (1L, "A B C D E F G H"),
      (2L, "A B C D x E F G H")
    ).toDF("doc_id", "text")
    val got = Dedup.spanMaximalIntervals(docs, "doc_id", "text", minLen = 4, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 0L, 8L), (2L, 0L, 4L), (2L, 5L, 4L)))
  }

  test("spanMaximalIntervals: within-doc repeats don't count toward minDocs, len >= L always") {
    val docs = Seq(
      (1L, "A B C D z A B C D"),  // repeats only within itself
      (2L, "unrelated text entirely here")
    ).toDF("doc_id", "text")
    assert(Dedup.spanMaximalIntervals(docs, "doc_id", "text", 4, 2).count() === 0L)
    // and on the real corpus: intervals well-formed, len >= L, sorted &
    // non-overlapping per doc
    val corpus = graft.model.VectorModel.documents(spark, Sf0001)
    val ivs = Dedup.spanMaximalIntervals(corpus, "doc_id", "text",
      DedupQueries.MaxSpanL, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ivs.nonEmpty, "fixture must contain >=L-token cross-doc repeats")
    ivs.foreach { case (_, s, l) =>
      assert(s >= 0 && l >= DedupQueries.MaxSpanL)
    }
    ivs.groupBy(_._1).values.foreach { ds =>
      val sorted = ds.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, s1, l1), (_, s2, _)) =>
          assert(s1 + l1 < s2, "intervals must be maximal (disjoint, non-touching)")
        case _ =>
      }
    }
  }

  test("packBpe: offsets tile gaplessly in BPE-token units") {
    val r = graft.queries.PipelineQueries.packBpe(spark, Sf0001).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)))
    assert(r.nonEmpty)
    // total packed length equals the sum of per-doc BPE counts
    val stats = graft.queries.TextQueries.bpeStats(spark, Sf0001)
      .collect().map(row => row.getLong(0) -> row.getLong(3)).toMap
    val byStart = r.sortBy(_._2)
    // gapless: consecutive starts differ by exactly the doc's BPE count
    // (clamped to >= 1 — pack's positive-count precondition)
    def n(doc: Long) = math.max(stats(doc), 1L)
    byStart.sliding(2).foreach {
      case Array((d1, s1, _, _, _), (_, s2, _, _, _)) =>
        assert(s2 - s1 === n(d1))
      case _ =>
    }
    val (lastDoc, lastStart, _, _, _) = byStart.last
    assert(lastStart + n(lastDoc) === stats.keysIterator.map(n).sum)
  }

  test("shuffleShards: permutation, dense per-shard positions, deterministic") {
    val a = PipelineQueries.shuffleShards(spark, Sf0001).collect()
    val nDocs = graft.model.VectorModel.documents(spark, Sf0001).count()
    assert(a.length === nDocs)
    assert(a.map(_.getLong(0)).distinct.length === nDocs)
    // positions are dense 0..n_s-1 within each shard
    a.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val ps = rows.map(_.getLong(2)).sorted
      assert(ps.toSeq === (0L until ps.length).toSeq)
    }
    // replayable: identical assignment on a second run
    val b = PipelineQueries.shuffleShards(spark, Sf0001).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      b.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("temperatureMix: heaviest source keeps all, thresholds monotone in mass") {
    val mix = PipelineQueries.temperatureMix(spark, Sf0001)
    val rows = mix.collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // n_kept <= n_docs
      assert(r.getLong(3) >= 0L && r.getLong(3) <= PipelineQueries.MixBuckets)
    }
    // the max-mass source has rate 1.0 -> threshold == MixBuckets -> keeps all
    val mass = graft.model.VectorModel.documents(spark, Sf0001)
      .groupBy("source").agg(sum("n_chars").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val heaviest = mass.maxBy(_._2)._1
    val hr = rows.find(_.getString(0) == heaviest).get
    assert(hr.getLong(3) === PipelineQueries.MixBuckets)
    assert(hr.getLong(2) === hr.getLong(1))
    // monotone: more mass never means a lower threshold
    val byMass = rows.sortBy(r => mass(r.getString(0)))
    byMass.sliding(2).foreach {
      case Array(lo, hi) => assert(lo.getLong(3) <= hi.getLong(3))
      case _ =>
    }
  }

  test("epochMix: heaviest passes once, cap holds, mass within fractional slack") {
    val mix = PipelineQueries.epochMix(spark, Sf0001)
    val rows = mix.collect() // (source, n_docs, n_emitted, max_rep, threshold)
    val B = PipelineQueries.MixBuckets
    val mass = graft.model.VectorModel.documents(spark, Sf0001)
      .groupBy("source").agg(sum("n_chars").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val heaviest = mass.maxBy(_._2)._1
    rows.foreach { r =>
      val (nDocs, nEmit, maxRep, thr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // repetition cap: no doc repeats past EpochCap epochs
      assert(maxRep <= PipelineQueries.EpochCap.toLong,
        s"${r.getString(0)}: max_rep $maxRep over cap")
      assert(thr >= B, s"upsampling thresholds are >= one full epoch, got $thr")
      // mass conservation: emitted count brackets rate*n_docs — every doc
      // emits floor(thr/B) or ceil(thr/B) copies
      assert(nEmit >= (thr / B) * nDocs && nEmit <= ((thr + B - 1) / B) * nDocs,
        s"${r.getString(0)}: $nEmit outside [${(thr / B) * nDocs}, ${((thr + B - 1) / B) * nDocs}]")
    }
    // heaviest-source identity: rate exactly 1.0 -> exactly one copy of
    // every doc, no repetition
    val hr = rows.find(_.getString(0) == heaviest).get
    assert(hr.getLong(4) === B)
    assert(hr.getLong(2) === hr.getLong(1))
    assert(hr.getLong(3) === 1L)
    // lighter sources repeat at least as much: thresholds antitone in mass
    val byMass = rows.sortBy(r => mass(r.getString(0)))
    byMass.sliding(2).foreach {
      case Array(lo, hi) => assert(lo.getLong(4) >= hi.getLong(4))
      case _ =>
    }
  }

  test("qualityMix: composition equals gate-then-mix, bounds hold") {
    val rows = PipelineQueries.qualityMix(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (s, nDocs, nQ, nKept, thr) =>
      assert(nQ <= nDocs, s"$s: more quality docs than docs")
      assert(nKept <= nQ, s"$s: kept more than passed the gate")
      assert(thr >= 0L && thr <= PipelineQueries.MixBuckets)
    }
    // driver recompute: gate with the same trained model, then the mix
    // arithmetic over the survivors
    val docs = graft.model.VectorModel.documents(spark, Sf0001)
    val model = graft.queries.TextQueries.qualityModel(spark, Sf0001)
    val gatedIds = graft.text.QualityModel
      .score(docs.select("doc_id", "text"), model)
      .where(col("is_quality") === 1L)
      .collect().map(_.getLong(0)).toSet
    val gated = docs.collect().map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
      .filter { case (id, _, _) => gatedIds(id) }
    val mass = gated.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val mmax = mass.values.max
    val expThr = mass.map { case (s, m) =>
      s -> math.floor(math.sqrt(m.toDouble / mmax.toDouble) *
        PipelineQueries.MixBuckets.toDouble).toLong
    }
    rows.foreach { case (s, _, nQ, _, thr) =>
      assert(thr === expThr(s), s"$s: threshold $thr vs ${expThr(s)}")
      assert(nQ === gated.count(_._2 == s).toLong)
    }
    // the heaviest GATED source keeps all its survivors
    val heaviest = mass.maxBy(_._2)._1
    val hr = rows.find(_._1 == heaviest).get
    assert(hr._5 === PipelineQueries.MixBuckets && hr._4 === hr._3)
  }

  test("dsirSample: planted two-domain fixture — target domain upsampled, off-domain rejected") {
    import graft.text.Dsir
    val aVocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val bVocab = Array("omega", "sigma", "lambda", "kappa", "mu", "nu", "xi", "rho")
    def mk(id: Long, v: Array[String]): (Long, String) =
      (id, (0 until 30).map(i => v(((id + i) % v.length).toInt)).mkString(" "))
    val aDocs = (0L until 120L).map(mk(_, aVocab))
    val bDocs = (1000L until 1120L).map(mk(_, bVocab))
    val corpus = (aDocs ++ bDocs).toDF("doc_id", "text")
    val target = aDocs.take(30).toDF("doc_id", "text") // a small sample of domain A
    val m = Dsir.fit(corpus, target)
    val dec = Dsir.decisions(corpus, m).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(dec.length === 240)
    val (a, b) = dec.partition(_._1 < 1000L)
    // domain A (what the target samples): every doc scores positive →
    // level 0 → kept with probability 1; domain B: the smoothed target
    // probability of its vocabulary is ~1/|target tokens|, so scores sit
    // far past the acceptance table's floor — rejected outright
    assert(a.forall(_._2 > 0L), s"A-domain scores must be positive, min ${a.map(_._2).min}")
    assert(a.forall(_._4 == 1L), "every target-domain doc must be kept")
    assert(b.forall(_._2 < -(Dsir.Levels.toLong * Dsir.LevelQ)),
      s"B-domain scores must fall past the table floor, max ${b.map(_._2).max}")
    assert(b.forall(_._4 == 0L), "every off-domain doc must be rejected")
    // acceptance-mass bound: P(keep) = thr[level]/2^60 <= exp(min(0, z/1e6))
    // by construction of the table — check the published thresholds
    m.thr.zipWithIndex.foreach { case (t, l) =>
      val bound = math.exp(-l * Dsir.LevelNats) * (1L << 60).toDouble
      assert(t.toDouble <= bound && t >= 0L, s"level $l threshold $t above its mass bound")
    }
    assert(m.thr(0) === (1L << 60), "level 0 must accept always")
    assert(m.thr(Dsir.Levels) === 0L, "the table floor must reject always")
  }

  test("dsirSample: acceptance is per-doc pure — composes with any upstream gate") {
    import graft.text.Dsir
    val vocab = Array("alpha", "beta", "omega", "sigma", "mu", "nu")
    val docs = (0L until 100L).map(id =>
      (id, (0 until 20).map(i => vocab(((id * 7 + i) % vocab.length).toInt)).mkString(" ")))
      .toDF("doc_id", "text")
    val m = Dsir.fit(docs, docs.where(col("doc_id") < 20L))
    // gate-then-sample == sample-then-gate under the SAME fitted model:
    // the decision depends only on the doc and the model (the coin is the
    // doc's own salted hash), which is what lets DSIR stack after the
    // quality gate / dedup keepers without re-flipping anyone's coin
    val gated = docs.where(col("doc_id") % 2 === 0)
    val composed = Dsir.decisions(gated, m).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._1)
    val filtered = Dsir.decisions(docs, m)
      .where(col("doc_id") % 2 === 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._1)
    assert(composed.toSeq === filtered.toSeq)
  }

  test("dsirSample: registered ledger — bounds hold, deterministic") {
    // the corpus sources share one synthetic vocabulary and the sf0.001
    // target sample is a handful of docs, so add-one smoothing dominates
    // the per-source score differences — DOMAIN separation is what the
    // planted-fixture test above proves; here the claims are the ledger
    // invariants and exact replayability of the registered entry
    val rows = PipelineQueries.dsirSample(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (s, nDocs, nKept, minZ, maxZ) =>
      assert(nKept >= 0L && nKept <= nDocs, s"$s: kept $nKept of $nDocs")
      assert(minZ <= maxZ)
    }
    // deterministic: a second evaluation is value-identical
    val again = PipelineQueries.dsirSample(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.toSeq === rows.toSeq)
  }

  test("domainMix: learned domains partition the corpus, mix arithmetic recomputes") {
    val rows = PipelineQueries.domainMix(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= PipelineQueries.DomainK)
    val docs = graft.model.VectorModel.documents(spark, Sf0001)
    // a partition: every doc lands in exactly one domain
    assert(rows.map(_._2).sum === docs.count())
    rows.foreach { case (dm, nDocs, nKept, thr) =>
      assert(dm >= 0 && dm < PipelineQueries.DomainK)
      assert(nKept >= 0L && nKept <= nDocs)
      assert(thr >= 0L && thr <= PipelineQueries.MixBuckets)
    }
    // driver recompute of the thresholds from the assigned masses
    val m = PipelineQueries.domainModel(spark, Sf0001)
    val emb = new graft.text.HashEmbedder(graft.queries.TextQueries.EmbedDim)
    val mass = graft.index.Ivf.assign(
        docs.select(col("doc_id"), col("n_chars"), emb.embed(col("text")).as("vector")), m)
      .groupBy("cluster_id").agg(sum("n_chars").as("mass"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val mmax = mass.values.max
    rows.foreach { case (dm, _, _, thr) =>
      val exp = math.floor(math.sqrt(mass(dm).toDouble / mmax.toDouble) *
        PipelineQueries.MixBuckets.toDouble).toLong
      assert(thr === exp, s"domain $dm: threshold $thr vs $exp")
    }
    // the heaviest learned domain keeps everything it holds
    val heaviest = mass.maxBy(_._2)._1
    val hr = rows.find(_._1 == heaviest).get
    assert(hr._4 === PipelineQueries.MixBuckets && hr._3 === hr._2)
    // deterministic: a second evaluation is value-identical
    val again = PipelineQueries.domainMix(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === rows.toSeq)
  }

  test("dsirMix: stage composition equals gate-then-dsir-then-mix, bounds hold") {
    val rows = PipelineQueries.dsirMix(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (s, nDocs, nQ, nDsir, nKept, thr) =>
      assert(nQ <= nDocs, s"$s: more quality docs than docs")
      assert(nDsir <= nQ, s"$s: more dsir survivors than gated docs")
      assert(nKept <= nDsir, s"$s: kept more than survived dsir")
      assert(thr >= 0L && thr <= PipelineQueries.MixBuckets)
    }
    // driver recompute of all three stages through the library calls
    val docs = graft.model.VectorModel.documents(spark, Sf0001)
    val qm = graft.queries.TextQueries.qualityModel(spark, Sf0001)
    val dm = PipelineQueries.dsirModel(spark, Sf0001)
    val gatedIds = graft.text.QualityModel
      .score(docs.select("doc_id", "text"), qm)
      .where(col("is_quality") === 1L).collect().map(_.getLong(0)).toSet
    val gated = docs.where(col("doc_id").isInCollection(gatedIds))
    val dsirIds = graft.text.Dsir.decisions(gated, dm)
      .where(col("kept") === 1L).collect().map(_.getLong(0)).toSet
    val sv = docs.collect().map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
      .filter { case (id, _, _) => dsirIds(id) }
    val mass = sv.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val mmax = mass.values.max
    val expThr = mass.map { case (s, m) =>
      s -> math.floor(math.sqrt(m.toDouble / mmax.toDouble) *
        PipelineQueries.MixBuckets.toDouble).toLong
    }
    rows.foreach { case (s, _, nQ, nDsir, _, thr) =>
      assert(nDsir === sv.count(_._2 == s).toLong, s"$s: dsir survivor count")
      if (nDsir > 0) assert(thr === expThr(s), s"$s: threshold $thr vs ${expThr(s)}")
    }
    // DSIR purity is what makes the stage order well-defined: deciding
    // over the gated subset equals deciding over everything then gating
    val allKept = graft.text.Dsir.decisions(docs, dm)
      .where(col("kept") === 1L).collect().map(_.getLong(0)).toSet
    assert(dsirIds === allKept.intersect(gatedIds))
    // the heaviest SURVIVING source keeps all its survivors
    val heaviest = mass.maxBy(_._2)._1
    val hr = rows.find(_._1 == heaviest).get
    assert(hr._6 === PipelineQueries.MixBuckets && hr._5 === hr._4)
  }

  test("lshIncrementalPairs: delta matches corpus dups only, never delta-delta") {
    val docs = Seq(
      // 0/1 identical (0 = delta, 1 = corpus) -> must match at est 1.0
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox jumps over the lazy dog today"),
      // 20/40 identical but BOTH delta (ids % 20 == 0) -> must NOT pair
      (20L, "pack my box with five dozen liquor jugs right now"),
      (40L, "pack my box with five dozen liquor jugs right now"),
      // corpus-only unique doc -> no pair
      (3L, "sphinx of black quartz judge my vow again and again")
    ).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 32, 3)
    val delta = sig.where(col("doc") % 20 === 0)
    val corpus = sig.where(col("doc") % 20 =!= 0)
    val got = Dedup.lshIncrementalPairs(delta, corpus, 32, 8, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((0L, 1L, 1.0)))
    // consistency: the incremental match set equals the self-join pairs
    // restricted to delta x corpus
    val self = Dedup.lshCandidatePairs(sig, 32, 8, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 20 == 0) != (b % 20 == 0) }
      .map { case (a, b) => if (a % 20 == 0) (a, b) else (b, a) }.toSet
    assert(got.map(g => (g._1, g._2)).toSet === self)
  }

  test("lshIncrementalPairs: overlap never self-pairs; salted equals unsalted") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "sphinx of black quartz judge my vow again and again")
    ).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 32, 3)
    // corpus = ALL docs (doc 0's signatures already appended — the re-run
    // window); delta = doc 0. It must match 1 but never itself.
    val delta = sig.where(col("doc") === 0L)
    val plain = Dedup.lshIncrementalPairs(delta, sig, 32, 8, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(plain.toSeq === Seq((0L, 1L, 1.0)))
    val salted = Dedup.lshIncrementalPairs(delta, sig, 32, 8, 0.5, skewSalt = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(salted.sorted.toSeq === plain.sorted.toSeq)
  }

  test("bigramRarity: bounds hold, zero-bigram docs score 0, deterministic") {
    val r = graft.queries.TextQueries.bigramRarity(spark, Sf0001).collect()
    val nDocs = graft.model.VectorModel.documents(spark, Sf0001).count()
    assert(r.length === nDocs)
    r.foreach { row =>
      val (nb, nr, f) = (row.getLong(1), row.getLong(2), row.getDouble(3))
      assert(nr >= 0L && nr <= nb)
      assert(f >= 0.0 && f <= 1.0)
      if (nb == 0L) assert(f === 0.0)
    }
    val again = graft.queries.TextQueries.bigramRarity(spark, Sf0001).collect()
    assert(r.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("eventsRetention: offset-0 rows are cohort sizes and bound later offsets") {
    val ret = AnalyticsQueries.eventsRetention(spark, Sf0001).collect()
    assert(ret.nonEmpty)
    val cohortSize = ret.filter(_.getLong(1) == 0L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every user appears in exactly one cohort, so offset-0 counts sum to
    // the distinct-user total
    val nUsers = graft.model.VectorModel.events(spark, Sf0001)
      .select("user_id").distinct().count()
    assert(cohortSize.values.sum === nUsers)
    ret.foreach { r =>
      assert(r.getLong(2) <= cohortSize(r.getLong(0)))
      assert(r.getLong(1) >= 0L && r.getLong(1) <= AnalyticsQueries.RetentionMaxOffset)
    }
  }

  // ---- fuzzy (MinHash) decontamination: the contamination classes the
  // exact 4-gram path provably misses, on planted fixtures (round 15) ----

  private def exactFlags(train: org.apache.spark.sql.DataFrame,
      eval: org.apache.spark.sql.DataFrame): Set[Long] =
    Dedup.contaminatedDocs(train, eval, "doc_id", "text",
        PipelineQueries.DecontamK)
      .collect().map(_.getLong(0)).toSet

  private def fuzzyFlags(train: org.apache.spark.sql.DataFrame,
      eval: org.apache.spark.sql.DataFrame, threshold: Double)
      : Map[Long, (Long, Double)] =
    Dedup.fuzzyContaminated(train, eval, "doc_id", "text",
        threshold = threshold)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("fuzzy decontamination catches a verbatim SHORT eval item the exact path is blind to") {
    // a 3-word eval item (a benchmark answer) produces NO 4-grams, so the
    // exact path cannot see even its verbatim copy; the fuzzy path
    // shingles at k=3 and scores the copy at est = 1.0
    val eval = Seq((100L, "quantum flux capacitor")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "quantum flux capacitor"),
      (2L, "completely unrelated training content words here")
    ).toDF("doc_id", "text")
    assert(exactFlags(train, eval) === Set.empty[Long])
    val fz = fuzzyFlags(train, eval, threshold = 0.5)
    assert(fz.keySet === Set(1L))
    assert(fz(1L) === ((1L, 1.0)))
  }

  test("fuzzy decontamination catches an insertion paraphrase with zero shared 4-grams") {
    // one word inserted mid-item breaks EVERY 4-gram (max clean run 3 on
    // both sides of the insertion) — exact misses; the shingle sets still
    // overlap (est 0.34375, band-collision verified for this fixture) so
    // the fuzzy path flags it at a paraphrase-grade floor
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma mu delta epsilon zeta"),
      (2L, "completely unrelated training content words here")
    ).toDF("doc_id", "text")
    assert(exactFlags(train, eval) === Set.empty[Long])
    val fz = fuzzyFlags(train, eval, threshold = 0.2)
    assert(fz.keySet === Set(1L))
    assert(fz(1L)._2 === 0.34375)
  }

  test("fuzzy and exact decontamination agree on an ordinary near-dup; neither flags clean docs") {
    // a long doc with only the last word changed keeps shared 4-grams
    // (exact flags) AND high shingle similarity (fuzzy flags at the
    // registered 0.5 floor — est 0.8125 for this fixture)
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda omega"),
      (2L, "completely unrelated training content words here today")
    ).toDF("doc_id", "text")
    assert(exactFlags(train, eval) === Set(1L))
    val fz = fuzzyFlags(train, eval,
      threshold = DedupQueries.FuzzyDecontamThreshold)
    assert(fz.keySet === Set(1L))
    assert(fz(1L)._2 === 0.8125)
  }

  test("pipe_train_corpus_fuzzy == pipe_train_corpus minus the fuzzy-flagged docs") {
    // composition contract on real data: the fuzzy variant's chunk set is
    // the plain variant's with exactly the flagged docs' chunks removed
    val plain = PipelineQueries.trainCorpus(spark, Sf0001)
      .select("doc_id", "chunk_ix", "chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val fuzzy = PipelineQueries.trainCorpusFuzzy(spark, Sf0001)
      .select("doc_id", "chunk_ix", "chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val flagged = DedupQueries.decontaminateFuzzy(spark, Sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.nonEmpty, "sf0.001 must plant at least one fuzzy hit")
    assert(fuzzy === plain.filterNot { case (d, _, _) => flagged(d) })
    assert(fuzzy.subsetOf(plain))
  }

  test("pipe_audit explains the corpus it ships with: kept == trainCorpus docs, first-failure verdicts") {
    val audit = PipelineQueries.auditCorpus(spark, Sf0001).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getString(6))).toMap
    // one row per training CANDIDATE (the eval slice is the reference)
    val docs = graft.model.VectorModel.documents(spark, Sf0001)
    val candidates = docs
      .where(col("source") =!= PipelineQueries.EvalSource)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(audit.keySet === candidates)
    // the audit's kept set IS the corpus's doc set — the no-drift pin
    val corpusDocs = PipelineQueries.trainCorpus(spark, Sf0001)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(audit.filter(_._2._5 == "kept").keySet === corpusDocs)
    // verdict = the FIRST failing stage in scheduling order, and every
    // verdict class actually occurs on the fixture corpus
    audit.foreach { case (id, (k, c, q, s, v)) =>
      val expect =
        if (!k) "near_duplicate"
        else if (c) "contaminated"
        else if (!q) "low_quality"
        else if (!s) "sampled_out"
        else "kept"
      assert(v === expect, s"doc $id: verdict $v, flags k=$k c=$c q=$q s=$s")
    }
    val verdicts = audit.values.map(_._5).toSet
    assert(verdicts === Set("near_duplicate", "contaminated", "low_quality",
      "sampled_out", "kept"),
      s"fixture corpus must exercise every verdict class, got $verdicts")
  }

  test("pipe_split_audit: every near-dup pair is split-diagonal, totals tile the pair layout") {
    val audit = PipelineQueries.splitAudit(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(audit.nonEmpty)
    // the leakproof property, value-level: no off-diagonal bucket exists
    audit.foreach { case (a, b, n) =>
      assert(a === b, s"cross-split near-dup pairs leaked: ($a, $b) x $n") }
    // completeness: the audit accounts for EVERY pair in the layout
    val totalPairs = spark.read.parquet(
      graft.queries.DedupQueries.pairLayout(spark, Sf0001)).count()
    assert(audit.map(_._3).sum === totalPairs)
    // the negative control: a PER-DOC hash split (the leak this audit
    // catches) does show cross-split pairs on the same corpus
    val perDoc = graft.model.VectorModel.documents(spark, Sf0001)
      .select(col("doc_id"),
        (graft.dedup.Dedup.hash60(col("doc_id").cast("string")) % 100 < 90)
          .cast("string").as("split"))
    val pairs = spark.read.parquet(
      graft.queries.DedupQueries.pairLayout(spark, Sf0001)).select("da", "db")
    val cross = pairs
      .join(perDoc.select(col("doc_id").as("da"), col("split").as("sa")), Seq("da"))
      .join(perDoc.select(col("doc_id").as("db"), col("split").as("sb")), Seq("db"))
      .where(col("sa") =!= col("sb")).count()
    assert(cross > 0,
      "fixture corpus must demonstrate the per-doc-split leak the audit catches")
  }

  test("pipe_train_corpus_semantic == pipe_train_corpus minus the cosine-flagged docs") {
    // same composition contract for the meaning-level rung: the semantic
    // variant's chunk set is the plain variant's with exactly the
    // embedding-cosine-flagged docs' chunks removed
    val plain = PipelineQueries.trainCorpus(spark, Sf0001)
      .select("doc_id", "chunk_ix", "chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val sem = PipelineQueries.trainCorpusSemantic(spark, Sf0001)
      .select("doc_id", "chunk_ix", "chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val flagged = PipelineQueries.decontaminateSemantic(spark, Sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.nonEmpty, "sf0.001 must flag at least one semantic hit")
    assert(sem === plain.filterNot { case (d, _, _) => flagged(d) })
    assert(sem.subsetOf(plain))
    // the semantic pass flags something the exact 4-gram pass does not —
    // the reason the rung exists
    val exactFlagged = PipelineQueries.decontaminate(spark, Sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((flagged -- exactFlagged).nonEmpty,
      "semantic flags must reach docs the exact n-gram pass misses")
  }

  test("bucketed semantic decontamination: exact sims, full flag recall vs the broadcast path") {
    // the escape hatch for large |eval| must be exercised, not just
    // cited: the IVF-bucketed twin's flagged set is judged against the
    // broadcast-exact path's
    val exact = PipelineQueries.decontaminateSemantic(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val bucketed = PipelineQueries.decontaminateSemanticIvf(spark, Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(exact.nonEmpty)
    // subset by construction: the bucketed path can only MISS pairs
    assert(bucketed.keySet.subsetOf(exact.keySet),
      s"bucketed path flagged docs the exact path did not: ${bucketed.keySet -- exact.keySet}")
    // recall gate — the probing parameters must recover the flag set
    val recall = bucketed.size.toDouble / exact.size
    assert(recall >= 0.9, s"flag recall $recall < 0.9 " +
      s"(missed: ${exact.keySet -- bucketed.keySet})")
    // where a doc is flagged by both, the winning cosine is EXACT (the
    // approximation is in candidate generation only) — the max may still
    // differ if the argmax eval doc was not probed, so gate on ≤ and on
    // hit-count ≤
    bucketed.foreach { case (d, (ms, nh)) =>
      assert(ms <= exact(d)._1 + 1e-9, s"doc $d bucketed max_sim exceeds exact")
      assert(nh <= exact(d)._2, s"doc $d bucketed n_hits exceeds exact")
    }
    // and usually the argmax IS probed — require value identity on ≥90%
    val identical = bucketed.count { case (d, v) => v == exact(d) }
    assert(identical >= (bucketed.size * 0.9).floor.toInt,
      s"only $identical/${bucketed.size} flagged docs carry the exact (max_sim, n_hits)")
  }

  test("stratifiedSample: exact per-stratum quota, subset, small strata take-all") {
    val rows = PipelineQueries.stratifiedSample(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val pop = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byLang = rows.groupBy(_._1)
    assert(byLang.keySet === pop.keySet, "every stratum is represented")
    byLang.foreach { case (lang, sample) =>
      assert(sample.length ===
        math.min(PipelineQueries.StratSampleSize.toLong, pop(lang)).toInt,
        s"$lang quota")
      assert(sample.forall(_._3 == pop(lang)), s"$lang population rides along")
      sample.foreach { case (_, id, _) =>
        assert(docs.exists(d => d._1 == id && d._2 == lang),
          s"sampled $id not in stratum $lang")
      }
    }
    // a stratum smaller than the quota is taken whole (planted frame)
    val planted = (0 until 100).map(i =>
      (i.toLong, if (i < 3) "tiny" else "big")).toDF("doc_id", "lang")
      .withColumn("doc_id", col("doc_id"))
    val kept = graft.operators.TopK.perGroupBottomS(
      planted.select(col("lang"),
        Dedup.hash60(concat(lit("strat:"), col("doc_id").cast("string"))).as("pri"),
        col("doc_id").cast("double").as("v")),
      "lang", col("pri"), col("v"), PipelineQueries.StratSampleSize)
      .collect().map(r => r.getString(0)).groupBy(identity).view.mapValues(_.length).toMap
    assert(kept("tiny") === 3)
    assert(kept("big") === PipelineQueries.StratSampleSize)
    // deterministic replay
    val again = PipelineQueries.stratifiedSample(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === rows.toSeq)
  }

  test("diverseSample: quotas over LEARNED domains, sample consistent with assignment") {
    val rows = PipelineQueries.diverseSample(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // re-derive the assignment with the same memoized model: every sampled
    // doc must sit in the domain it was sampled from, every domain's
    // sample size must be exactly min(s, population), and populations must
    // partition the corpus
    val m = PipelineQueries.domainModel(spark, Sf0001)
    val emb = new graft.text.HashEmbedder(graft.queries.TextQueries.EmbedDim)
    val asg = graft.index.Ivf.assign(
        spark.read.parquet(s"$Sf0001/documents.parquet")
          .select(col("doc_id"), emb.embed(col("text")).as("vector")), m)
      .select(col("doc_id"), col("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pop = asg.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(rows.map(_._3).sum / rows.groupBy(_._1).size >= 1) // populations ride along
    rows.groupBy(_._1).foreach { case (dom, sample) =>
      assert(sample.length ===
        math.min(PipelineQueries.StratSampleSize.toLong, pop(dom)).toInt,
        s"domain $dom quota")
      sample.foreach { case (_, id, n) =>
        assert(asg(id) === dom, s"doc $id sampled from domain $dom but assigned ${asg(id)}")
        assert(n === pop(dom))
      }
    }
    assert(rows.map(_._3).toSet.size === rows.groupBy(_._1).size ||
      pop.values.toSet.size < pop.size) // per-domain populations consistent
    val again = PipelineQueries.diverseSample(spark, Sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === rows.toSeq)
  }
}
