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
}
