package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.text.Bpe

/** Gates for the BPE tokenizer ([[graft.text.Bpe]]): training semantics
  * on hand-computable fixtures, kernel==driver encode identity (the
  * spec-gate the corpus-trained rows-only entry rides on — the
  * fixture-model entry `tx_bpe_stats` is hash-gated by the recursive-CTE
  * oracle), and the structural properties any merge list must satisfy. */
class BpeSpec extends SparkSpec {

  test("trainFromCounts learns the hand-computed merges on a micro fixture") {
    // counts: ("abab", 3), ("ab", 2)  — pairs: (a,b) = 3*2 + 2*1 = 8,
    // (b,a) = 3. merge 1 = (a,b) -> tokens (ab,ab),(ab).
    // then pairs: (ab,ab) = 3 -> merge 2 = (ab,ab). then no pair with
    // count >= 2 remains ((abab) has length 1) -> stop.
    val m = Bpe.trainFromCounts(Seq("abab" -> 3L, "ab" -> 2L), 10)
    assert(m.merges === Vector("a" -> "b", "ab" -> "ab"))
    assert(m.encodeWord("abab") === Seq("abab"))
    assert(m.encodeWord("ababab") === Seq("abab", "ab"))
    assert(m.encodeWord("ba") === Seq("b", "a"))
  }

  test("tie-break is the lexicographically smallest pair; count floor stops training") {
    // "xy" and "yz" both count 2 -> (x,y) wins the tie. after merging,
    // remaining pairs all have count 1 -> stop despite numMerges=10.
    val m = Bpe.trainFromCounts(Seq("xy" -> 2L, "yz" -> 2L), 10)
    assert(m.merges.head === ("x" -> "y"))
    assert(m.merges.size === 2, s"expected (x,y) then (y,z): ${m.merges}")
    assert(m.merges(1) === ("y" -> "z"))
  }

  test("training is deterministic and merges only ever shorten encodings") {
    val counts = VectorModel.documents(spark, Sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val m1 = Bpe.trainFromCounts(counts, 48)
    val m2 = Bpe.trainFromCounts(counts, 48)
    assert(m1.merges === m2.merges, "training must be deterministic")
    // every learned pair's components form at strictly lower ranks —
    // the property that makes rank-order application == lowest-rank-loop
    val vocabAt = m1.merges.scanLeft(Set.empty[String]) {
      case (v, (a, b)) => v + (a + b)
    }
    m1.merges.zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.length == 1 || vocabAt(i).contains(a),
        s"merge $i left part '$a' not formed earlier")
      assert(b.length == 1 || vocabAt(i).contains(b),
        s"merge $i right part '$b' not formed earlier")
    }
    // prefixes of the merge list never produce SHORTER encodings than
    // the full list (each merge can only reduce token counts)
    counts.take(50).foreach { case (w, _) =>
      val full = m1.encodeWord(w).size
      val half = Bpe.encodeWordWith(m1.merges.take(m1.merges.size / 2), w).size
      assert(full <= half, s"'$w': full-model encode longer than half-model")
      assert(Bpe.encodeWordWith(Vector.empty, w).size === w.length)
    }
  }

  test("executor kernel == driver reference on every corpus word (corpus-trained model)") {
    val docs = VectorModel.documents(spark, Sf0001)
    val model = graft.queries.TextQueries.bpeModel(spark, Sf0001)
    assert(model.merges.nonEmpty)
    // kernel path: encode every distinct word through the broadcast
    // codegen expression; driver path: the shared encodeWordWith
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0).distinct()
    val viaKernel = words
      .select(col("w"), Bpe.bpeTokens(col("w"), model).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    viaKernel.foreach { case (w, toks) =>
      assert(toks === model.encodeWord(w), s"kernel drift on '$w'")
    }
    // every emitted token is a single code point or a learned merge
    val vocab = model.mergedVocab
    viaKernel.values.flatten.foreach { t =>
      assert(t.codePointCount(0, t.length) == 1 || vocab.contains(t),
        s"token '$t' neither a code point nor in the merged vocab")
    }
  }

  test("bpeTokens plan stays UDF-free (codegen kernel, broadcast merges)") {
    val docs = VectorModel.documents(spark, Sf0001)
    val plan = docs.select(
      Bpe.bpeTokens(col("text"), Bpe.FixtureModel).as("toks"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"plan must not contain a UDF:\n$plan")
    assert(plan.contains("bpe_encode"), s"expected the kernel expression:\n$plan")
  }

  // ---- production heap encode (Bpe.Encoder) --------------------------

  /** Deterministic synthetic model at production merge count: 128 "root
    * words" of 255 lowercase code points each, merged bottom-up by a
    * balanced binary tree (adjacent pairs at every level), concatenation-
    * deduped — every merge's components form at strictly lower ranks and
    * all concatenations are distinct, so the list is self-consistent by
    * construction, like a trained list. Low tree levels dedup hard (only
    * 676 possible 2-char merges); the sizing leaves >8k net merges. */
  private lazy val syntheticBig: (Bpe.BpeModel, Seq[String]) = {
    val rnd = new scala.util.Random(42)
    val words = (0 until 128).map { wi =>
      // distinct leading tag pins span-uniqueness across words
      val tag = f"w$wi%03d"
      tag + (0 until 252).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val seen = scala.collection.mutable.HashSet.empty[String]
    words.foreach { w =>
      var level: Vector[String] = Bpe.encodeWordWith(Vector.empty, w).toVector
      while (level.size > 1) {
        level = level.grouped(2).map { g =>
          if (g.size == 2) {
            val cat = g(0) + g(1)
            if (seen.add(cat)) merges += (g(0) -> g(1))
            cat
          } else g(0)
        }.toVector
      }
    }
    (Bpe.BpeModel(merges.toIndexedSeq), words)
  }

  test("heap encode == reference encode at >=8k merges, on full words and off-tree fragments") {
    val (model, words) = syntheticBig
    assert(model.merges.size >= 8000, s"want >=8k merges, got ${model.merges.size}")
    assert(Bpe.selfConsistent(model.merges), "synthetic list must be self-consistent")
    val rnd = new scala.util.Random(7)
    val cases = words ++
      words.map(w => w.substring(rnd.nextInt(40), 40 + rnd.nextInt(80))) ++ // substrings: partial tree coverage
      words.sliding(2).map(p => p.head.take(64) + p.last.drop(64)).toSeq ++ // chimeras: cross-word adjacency
      Seq("", "q", "zz", words.head * 2)
    cases.foreach { w =>
      assert(model.encodeWord(w) === Bpe.encodeWordWith(model.merges, w),
        s"heap/reference divergence on '${w.take(32)}...'")
    }
    // merges must actually fire hard (shared low-rank merges legitimately
    // break tree alignment, so full collapse isn't expected — compression is)
    words.foreach { w =>
      assert(model.encodeWord(w).size * 3 <= w.length * 2, s"model barely compressed '${w.take(16)}...'")
    }
  }

  test("heap encode == reference encode on the corpus-trained and fixture models over corpus words") {
    val words = VectorModel.documents(spark, Sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0).distinct()
      .collect().map(_.getString(0))
    val corpusModel = graft.queries.TextQueries.bpeModel(spark, Sf0001)
    for (m <- Seq(Bpe.FixtureModel, corpusModel); w <- words)
      assert(m.encodeWord(w) === Bpe.encodeWordWith(m.merges, w),
        s"heap/reference divergence on corpus word '$w'")
    // adversarial repeats + surrogate pairs (code-point splitting)
    val tricky = Seq("aaaaaaa", "ababab", "😀a😀a", "tablestables")
    for (m <- Seq(Bpe.FixtureModel, corpusModel); w <- tricky)
      assert(m.encodeWord(w) === Bpe.encodeWordWith(m.merges, w), s"divergence on '$w'")
  }

  test("non-self-consistent merge lists fall back to reference semantics") {
    // duplicate concatenation "abc" via two splits: rank-order pass and
    // lowest-rank-first loop would genuinely diverge on "xaabc" shapes —
    // the Encoder must detect this and serve the reference walk.
    val m = Vector("a" -> "b", "x" -> "abc", "ab" -> "c", "a" -> "bc")
    assert(!Bpe.selfConsistent(m))
    val enc = new Bpe.Encoder(m)
    for (w <- Seq("xabc", "xaabc", "abcabc", "ab"))
      assert(enc.encode(w) === Bpe.encodeWordWith(m, w), s"fallback drift on '$w'")
    // unformable component (never mergeable) is also non-self-consistent
    assert(!Bpe.selfConsistent(Vector("qq" -> "z")))
    assert(Bpe.selfConsistent(Bpe.FixtureModel.merges))
  }

  test("heap encode cost is independent of merge count (measured bound vs reference)") {
    val (model, words) = syntheticBig
    val enc = new Bpe.Encoder(model.merges)
    val reps = 8
    // warm both paths (JIT) before timing
    words.take(8).foreach { w => enc.encode(w); Bpe.encodeWordWith(model.merges, w) }
    val t0 = System.nanoTime()
    var i = 0
    while (i < reps) { words.foreach(w => enc.encode(w)); i += 1 }
    val fastNs = System.nanoTime() - t0
    val t1 = System.nanoTime()
    i = 0
    while (i < reps) { words.foreach(w => Bpe.encodeWordWith(model.merges, w)); i += 1 }
    val refNs = System.nanoTime() - t1
    val perWordUs = fastNs / 1000.0 / (reps * words.size)
    info(f"heap: $perWordUs%.1f us/word (255 cp, ${model.merges.size} merges); reference: ${refNs / 1000.0 / (reps * words.size)}%.1f us/word; speedup ${refNs.toDouble / fastNs}%.0fx")
    // the reference walk scans all 8128 merges per word; the heap walk is
    // O(|w| log |w|). Expect ~100-1000x; assert a generous 5x so host
    // noise can never flake the suite while a true regression still fails.
    assert(fastNs * 5 < refNs,
      f"heap encode must decisively beat the rank-order walk at 8k merges: fast=${fastNs / 1e6}%.1f ms ref=${refNs / 1e6}%.1f ms")
    assert(perWordUs < 500.0, f"per-word heap encode too slow: $perWordUs%.1f us")
  }

  test("fixture-model stats: counts are consistent and merges actually fire on the corpus") {
    val out = graft.queries.TextQueries.bpeStats(spark, Sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nw, nc, nb) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nb >= nw, "at least one token per word")
      assert(nb <= nc, "merging never exceeds character count")
    }
    // the fixture merges overlap the corpus vocabulary by construction —
    // if no merge ever fired, n_bpe would equal n_chars everywhere
    assert(out.exists(r => r.getLong(3) < r.getLong(2)),
      "fixture merges never fired on the corpus")
  }

  test("save/load round-trips the trained model; torn merge tables fail loudly") {
    val model = graft.queries.TextQueries.bpeModel(spark, Sf0001)
    assert(model.merges.nonEmpty)
    val path = graft.store.Fs.scratchDir(spark, "bpe_model") + "/merges"
    Bpe.save(spark, model, path)
    val back = Bpe.load(spark, path)
    // the merge table IS the model: order-exact equality, identical encode
    assert(back.merges === model.merges)
    val words = graft.model.VectorModel.documents(spark, Sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0).distinct().limit(50)
      .collect().map(_.getString(0))
    words.foreach { w =>
      assert(back.encodeWord(w) === model.encodeWord(w), s"word '$w'") }
    // a torn copy (lost rank) must not silently reorder merges
    val torn = spark.read.parquet(path).where(col("rank") =!= 2)
    val tornPath = graft.store.Fs.scratchDir(spark, "bpe_torn") + "/merges"
    torn.write.parquet(tornPath)
    val e = intercept[IllegalArgumentException](Bpe.load(spark, tornPath))
    assert(e.getMessage.contains("torn"), e.getMessage)
  }
}
