package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding — the trainable tokenizer a training-data pipeline
  * counts and packs with (the reference's declared-but-unshipped text
  * stack evidences a tokenizer dependency the same way it evidences
  * jieba; this is the standard subword algorithm, Sennrich et al. 2016,
  * public knowledge).
  *
  * 100 TB design: BPE training needs only WORD COUNTS, not the corpus —
  * so the distributed half is ONE wordcount aggregate (map-side combined,
  * one shuffle) capped to a bounded vocabulary, and merge learning runs
  * driver-side over that vocabulary, corpus-size-independent (the
  * sample-bounded-fit shape PQ/IVF training already use). Encoding the
  * full corpus is the distributed half: the learned merge list ships once
  * per executor as a broadcast and each word is encoded by the codegen'd
  * [[graft.functions.BpeKernel]] — plan size O(1) in the model, no UDF.
  *
  * Conventions (mirrored EXACTLY by the DuckDB recursive-CTE oracle of
  * `tx_bpe_stats` and by [[encodeWordWith]], the single shared
  * implementation):
  *  - words are whitespace tokens ([[TextAnalysis.tokens]] semantics);
  *    merges never cross word boundaries; no end-of-word marker;
  *  - initial symbols are CODE POINTS (surrogate-safe, = DuckDB's
  *    character semantics);
  *  - pair counting is over ALL adjacent occurrences (overlapping
  *    included), weighted by word count;
  *  - the best pair is max count, ties broken by the lexicographically
  *    SMALLEST (a, b) — fully deterministic;
  *  - training stops at `numMerges` or when the best pair count < 2;
  *  - encoding applies merges IN RANK ORDER, each as one left-to-right
  *    non-overlapping replacement pass (for a self-consistent trained
  *    merge list this equals the iterative lowest-rank-first loop: a
  *    pair's components always form at strictly lower ranks). */
object Bpe {

  final case class BpeModel(merges: IndexedSeq[(String, String)]) {
    require(merges == merges.distinct, "duplicate merge pairs")
    @transient private lazy val enc = new Encoder(merges)
    /** Driver-side encode — the kernel builds an [[Encoder]] over the
      * same merge list and both delegate to the same walk, so driver and
      * executor cannot drift. */
    def encodeWord(w: String): IndexedSeq[String] = enc.encode(w)
    /** The token vocabulary the model can emit: merged strings (single
      * code points are always emittable on top of these). */
    def mergedVocab: Set[String] = merges.map { case (a, b) => a + b }.toSet
  }

  private def splitCodePoints(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** REFERENCE encode (the semantic definition, mirrored by the DuckDB
    * oracle CTE): applies merges in rank order; each application is one
    * left-to-right non-overlapping replacement pass. O(merges · |w|) per
    * word — correct at any scale but three orders of magnitude off a
    * production tokenizer at a 50k-merge vocabulary, so the serving path
    * is [[Encoder]] (lowest-rank-adjacent-pair heap walk, O(|w| log |w|)
    * independent of merge count), which provably equals this for
    * self-consistent trained merge lists and falls back to this
    * otherwise. Kept as the spec-equality baseline and the fallback. */
  def encodeWordWith(merges: IndexedSeq[(String, String)], w: String)
      : IndexedSeq[String] = {
    if (w.isEmpty) return Vector.empty
    var toks: Array[String] = splitCodePoints(w)
    var m = 0
    while (m < merges.length) {
      val (a, b) = merges(m)
      if (toks.length >= 2 && w.contains(a + b)) {
        val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += a + b; i += 2
          } else { out += toks(i); i += 1 }
        }
        if (out.length < toks.length) toks = out.toArray
      }
      m += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(toks)
  }

  private def isCodePoint(s: String): Boolean =
    s.nonEmpty && s.codePointCount(0, s.length) == 1

  /** A merge list is SELF-CONSISTENT when (a) every merge's components
    * are single code points or concatenations of strictly earlier merges,
    * and (b) no two merges concatenate to the same string. Under (a)+(b),
    * merging the pair (a,b) at rank m can only create pairs whose merged
    * component is m's own output — which, being multi-code-point and
    * uniquely produced by m, cannot be a component of any merge of rank
    * < m (it was unformable when that merge was learned) and cannot
    * recreate (a,b) itself (a ≠ a+b, b ≠ a+b). So the rank-order
    * single-pass walk ([[encodeWordWith]]) and the iterative
    * lowest-rank-adjacent-pair walk ([[Encoder]]) produce identical
    * tokens. Trained lists satisfy this by construction (BpeSpec asserts
    * it); arbitrary hand-built lists may not — [[Encoder]] checks once
    * and falls back to the reference walk when the proof doesn't hold. */
  def selfConsistent(merges: IndexedSeq[(String, String)]): Boolean = {
    val concats = merges.map { case (a, b) => a + b }
    if (concats.toSet.size != merges.length) return false
    val formed = scala.collection.mutable.HashSet.empty[String]
    merges.forall { case (a, b) =>
      val ok = (isCodePoint(a) || formed(a)) && (isCodePoint(b) || formed(b))
      formed += a + b
      ok
    }
  }

  /** Array-backed long min-heap — keys are (rank << 32 | leftIndex), so
    * ordering is lowest rank first, leftmost occurrence on ties; no
    * boxing in the encode hot loop. */
  private final class LongHeap(initCap: Int) {
    private var a = new Array[Long](math.max(initCap, 8))
    private var n = 0
    def nonEmpty: Boolean = n > 0
    def push(v: Long): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = v; n += 1
      var i = n - 1
      while (i > 0 && a((i - 1) / 2) > a(i)) {
        val p = (i - 1) / 2; val t = a(i); a(i) = a(p); a(p) = t; i = p
      }
    }
    def pop(): Long = {
      val r = a(0); n -= 1; a(0) = a(n)
      var i = 0; var go = true
      while (go) {
        val l = 2 * i + 1; val rr = l + 1; var m = i
        if (l < n && a(l) < a(m)) m = l
        if (rr < n && a(rr) < a(m)) m = rr
        if (m == i) go = false
        else { val t = a(i); a(i) = a(m); a(m) = t; i = m }
      }
      r
    }
  }

  /** PRODUCTION encode: pair→rank map + lowest-rank-adjacent-pair merge
    * walk over a linked token list — O(|w| log |w|) per word, INDEPENDENT
    * of merge count (the reference walk is O(merges · |w|): untenable at
    * a real 50k-merge vocabulary). Token-identical to [[encodeWordWith]]
    * for self-consistent merge lists (see [[selfConsistent]] for the
    * argument); non-self-consistent lists take the reference walk so the
    * oracle-mirrored semantics hold unconditionally.
    *
    * Staleness handling: the heap holds (rank, leftIndex) candidates; a
    * popped candidate is applied iff its left node is alive and the pair
    * it currently starts RE-DERIVES the popped rank — ranks identify
    * pairs uniquely (merge pairs are distinct), so a rank-matching pair
    * is exactly the merge to apply regardless of how the entry aged, and
    * every live adjacent pair in the map always has a live heap entry
    * (both affected adjacencies are re-pushed after each merge). */
  final class Encoder(val merges: IndexedSeq[(String, String)])
      extends Serializable {
    @transient private lazy val ranks: java.util.HashMap[(String, String), Integer] = {
      val m = new java.util.HashMap[(String, String), Integer](merges.length * 2)
      merges.zipWithIndex.foreach { case (p, i) => m.put(p, Integer.valueOf(i)) }
      m
    }
    @transient private lazy val fast: Boolean = selfConsistent(merges)

    def encode(w: String): IndexedSeq[String] = {
      if (w.isEmpty) return Vector.empty
      if (!fast) return encodeWordWith(merges, w)
      val toks = splitCodePoints(w)
      val n = toks.length
      if (n < 2 || merges.isEmpty)
        return scala.collection.immutable.ArraySeq.unsafeWrapArray(toks)
      val next = Array.tabulate(n)(_ + 1)
      val prev = Array.tabulate(n)(_ - 1)
      val alive = Array.fill(n)(true)
      @inline def rankOf(i: Int, j: Int): Int = {
        val r = ranks.get((toks(i), toks(j)))
        if (r eq null) -1 else r.intValue()
      }
      val heap = new LongHeap(n)
      var i = 0
      while (i < n - 1) {
        val r = rankOf(i, i + 1)
        if (r >= 0) heap.push(r.toLong << 32 | i.toLong)
        i += 1
      }
      while (heap.nonEmpty) {
        val v = heap.pop()
        val r = (v >>> 32).toInt
        val li = (v & 0xffffffffL).toInt
        if (alive(li)) {
          val ri = next(li)
          if (ri < n && rankOf(li, ri) == r) {
            toks(li) = toks(li) + toks(ri)
            alive(ri) = false
            next(li) = next(ri)
            if (next(li) < n) prev(next(li)) = li
            val p = prev(li)
            if (p >= 0) {
              val pr = rankOf(p, li)
              if (pr >= 0) heap.push(pr.toLong << 32 | p.toLong)
            }
            val nx = next(li)
            if (nx < n) {
              val nr = rankOf(li, nx)
              if (nr >= 0) heap.push(nr.toLong << 32 | li.toLong)
            }
          }
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[String](n)
      i = 0
      while (i < n) { if (alive(i)) out += toks(i); i += 1 }
      out.toIndexedSeq
    }
  }

  /** Merge learning over a word-frequency table (Sennrich): the
    * corpus-size-independent half. Deterministic — see the object
    * scaladoc for the tie-break and stop rules. */
  def trainFromCounts(wordCounts: Seq[(String, Long)], numMerges: Int)
      : BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var words: Array[(Array[String], Long)] = wordCounts
      .filter(_._1.nonEmpty)
      .map { case (w, c) => (splitCodePoints(w), c) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var go = true
    while (go && merges.size < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) go = false
      else {
        val (bestPair, bestCount) = counts.foldLeft((("", ""), -1L)) {
          case (acc @ (bp, bc), (p, c)) =>
            if (c > bc || (c == bc && pairLt(p, bp))) (p, c) else acc
        }
        if (bestCount < 2) go = false
        else {
          merges += bestPair
          val (a, b) = bestPair
          words = words.map { case (syms, c) =>
            (applyOnce(syms, a, b), c)
          }
        }
      }
    }
    BpeModel(merges.toIndexedSeq)
  }

  private def pairLt(x: (String, String), y: (String, String)): Boolean =
    x._1 < y._1 || (x._1 == y._1 && x._2 < y._2)

  private def applyOnce(syms: Array[String], a: String, b: String)
      : Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Distributed training front door: ONE map-side-combined wordcount
    * shuffle, vocabulary capped to the top `vocabCap` words by
    * (count desc, word asc) — the driver never sees more than `vocabCap`
    * rows regardless of corpus size — then [[trainFromCounts]]. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      vocabCap: Int = 65536): BpeModel = {
    require(vocabCap > 0, s"vocabCap must be positive, got $vocabCap")
    val wc = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w"))
      .limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromCounts(wc, numMerges)
  }

  /** Persist a trained model as its ordered merge table (rank, a, b)
    * parquet — the TRAINER-HANDOFF artifact: encode is a pure function
    * of the merge ORDER, so the table is the complete model, reloadable
    * by any serving session ([[load]]) or readable by non-JVM tooling.
    * One file: a tokenizer is vocabulary-sized, never corpus-sized. */
  def save(spark: org.apache.spark.sql.SparkSession, model: BpeModel,
      path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), i) => (i + 1, a, b) }
      .toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a [[save]]d model. Fails loudly on rank gaps or duplicates —
    * a partially-copied merge table silently reordering merges would
    * change every encode downstream, the worst possible quiet failure
    * for shipped token ids. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): BpeModel = {
    val rows = spark.read.parquet(path).select("rank", "a", "b")
      .collect().sortBy(_.getInt(0))
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i + 1,
        s"$path: merge table rank ${r.getInt(0)} at position $i — gap or " +
          "duplicate; the artifact is torn") }
    BpeModel(rows.map(r => (r.getString(1), r.getString(2))).toIndexedSeq)
  }

  /** Fixed training fixture for the ORACLE-GATED encode entry: the
    * oracle SQL must be static text, so its merge table has to be a
    * compile-time constant — trained here from a self-written
    * word-frequency fixture of generic data-systems English (the same
    * fixed-fixture pattern as [[TextAnalysis.CjkDict]]). The
    * corpus-trained path ([[train]]) is spec-gated instead. */
  val FixtureCounts: Seq[(String, Long)] = Seq(
    "table" -> 50L, "tables" -> 12L, "query" -> 45L, "queries" -> 9L,
    "value" -> 40L, "values" -> 8L, "window" -> 35L, "scan" -> 33L,
    "batch" -> 30L, "stream" -> 28L, "spark" -> 26L, "filter" -> 24L,
    "column" -> 22L, "customer" -> 20L, "merge" -> 18L, "order" -> 17L,
    "group" -> 16L, "vector" -> 15L, "data" -> 14L, "join" -> 13L,
    "sort" -> 12L, "line" -> 11L, "hash" -> 10L, "part" -> 10L,
    "key" -> 9L, "row" -> 9L, "agg" -> 8L, "slow" -> 7L, "fast" -> 7L,
    "big" -> 6L, "small" -> 6L, "the" -> 20L, "a" -> 30L)

  val FixtureMerges = 32

  lazy val FixtureModel: BpeModel = trainFromCounts(FixtureCounts, FixtureMerges)

  /** Per-(merge list, context) kernel memo — same leak argument as
    * [[TextAnalysis.cjkTokensDictBig]]'s: Column-returning helpers get
    * re-invoked per query, and each un-memoized call would ship a fresh
    * undestroyed broadcast of the merge table. */
  private val kernelMemo = new java.util.concurrent.ConcurrentHashMap[
    IndexedSeq[(String, String)], graft.functions.BpeKernel]()
  @volatile private var kernelMemoCtx: String = ""
  private def kernelFor(model: BpeModel): graft.functions.BpeKernel =
    synchronized {
      val spark = org.apache.spark.sql.SparkSession.active
      val ctx = spark.sparkContext.applicationId
      if (ctx != kernelMemoCtx) { kernelMemo.clear(); kernelMemoCtx = ctx }
      // keyed by the FULL merge list (already driver-resident), not a
      // 32-bit content hash — a hash collision between two models would
      // silently serve the wrong encodings. Few live models per app, so
      // the key size is immaterial.
      kernelMemo.computeIfAbsent(model.merges, ms =>
        new graft.functions.BpeKernel(spark.sparkContext.broadcast(ms)))
    }

  /** BPE token stream of `text` under `model`: whitespace words (empties
    * dropped), each encoded by the broadcast kernel, flattened in word
    * order. Pure codegen'd expressions around the kernel — no UDF. */
  def bpeTokens(text: Column, model: BpeModel): Column = {
    val kernel = kernelFor(model)
    flatten(transform(
      filter(TextAnalysis.tokens(text), w => length(w) > 0),
      w => graft.functions.BpeExpressions.encode(w, kernel)))
  }

  def bpeTokenCount(text: Column, model: BpeModel): Column =
    size(bpeTokens(text, model))
}
