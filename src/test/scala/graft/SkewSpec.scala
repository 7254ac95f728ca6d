package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

import graft.dedup.Dedup

/** Skew evidence for the quadratic pair-generating joins: a deliberately
  * hot block (one hot brand at one name length; a mass-duplicated doc
  * cluster in one LSH bucket) must not serialize into one straggler task.
  *
  * Why salting and not AQE: these stages pin their shuffle width with
  * explicit repartitions (REPARTITION_BY_NUM — the guard against AQE
  * coalescing a byte-small but compute-quadratic stage to one partition),
  * and that origin is exempt from AQE's OptimizeSkewedJoin, so skew
  * handling is deterministic salting under the engine's control:
  * probe side salted by hash(key) mod S, build side replicated S ways.
  * The histograms below measure per-task records WRITTEN by the pair
  * stage — the direct proxy for per-task pair work — and show the
  * straggler without the salt and the bounded spread with it.
  */
class SkewSpec extends SparkSpec {

  /** Runs `df.collect()` under a task listener; returns the result rows
    * plus per-stage (records-read, records-written) per task. */
  private def withTaskMetrics(df: DataFrame)
      : (Array[org.apache.spark.sql.Row], Map[Int, Seq[(Long, Long)]]) = {
    val acc = mutable.Map[Int, mutable.Buffer[(Long, Long)]]()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        val m = Option(e.taskMetrics)
        val rd = m.map(_.shuffleReadMetrics.recordsRead).getOrElse(0L)
        val wr = m.map(_.shuffleWriteMetrics.recordsWritten).getOrElse(0L)
        acc.getOrElseUpdate(e.stageId, mutable.Buffer[(Long, Long)]()) +=
          ((rd, wr))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val rows =
      try {
        val r = df.collect()
        // listener bus is async — block until task-end events drain
        // (deterministic, unlike a fixed sleep on a loaded host)
        org.apache.spark.grafttest.ListenerBridge.waitUntilEmpty(
          spark.sparkContext, 30000)
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    (rows, acc.view.mapValues(_.toSeq).toMap)
  }

  /** The pair-producing stage = the stage writing the most shuffle
    * records. Returns (maxTaskWritten, totalWritten, nTasksWithOutput). */
  private def pairStageStats(hist: Map[Int, Seq[(Long, Long)]])
      : (Long, Long, Int) = {
    val (_, tasks) = hist.maxBy { case (_, ts) => ts.map(_._2).sum }
    val writes = tasks.map(_._2)
    (writes.max, writes.sum, writes.count(_ > 0))
  }

  private def logHist(name: String, hist: Map[Int, Seq[(Long, Long)]]): Unit =
    hist.toSeq.sortBy(_._1).foreach { case (st, ts) =>
      val w = ts.map(_._2)
      if (w.sum > 0)
        info(s"$name stage $st: tasks=${ts.size} written total=${w.sum} " +
          s"max=${w.max} histogram=${w.sorted.reverse.take(8).mkString(",")}")
    }

  // ---- fuzzy parts: one hot (brand, length) block --------------------

  private lazy val hotParts = {
    import spark.implicits._
    // 600 names, pairwise Levenshtein <= 2 (length-12 base with one
    // substituted char) — every pair qualifies, so pair work and pair
    // output are both |block|^2-shaped, all in ONE (brand, band) block
    val base = "abcdefghijkl"
    (0 until 600).map { i =>
      val pos = i % 12
      val c = ('m' + i / 12 % 2).toChar
      (i.toLong, "HOT", base.updated(pos, c))
    }.toDF("p_partkey", "p_brand", "p_name").cache()
  }

  test("fuzzy hot block: unsalted pair join serializes into one straggler") {
    val (rows, hist) = withTaskMetrics(graft.queries.DedupQueries.fuzzyPairs(
      hotParts, "p_partkey", "p_brand", "p_name",
      targetBlockRows = Int.MaxValue))
    logHist("unsalted", hist)
    val (maxW, totalW, _) = pairStageStats(hist)
    assert(rows.length > 100000, "fixture must be pair-dense")
    // the single hot block = a single join key: all pair output from one task
    assert(maxW >= (totalW * 0.9).toLong,
      s"expected a straggler: max=$maxW total=$totalW")
  }

  test("fuzzy hot block: auto-salt bounds per-task pair work, same result") {
    val salted = graft.queries.DedupQueries.fuzzyPairs(
      hotParts, "p_partkey", "p_brand", "p_name", targetBlockRows = 50)
    val (rows, hist) = withTaskMetrics(salted)
    logHist("salted", hist)
    val (maxW, totalW, nTasks) = pairStageStats(hist)
    assert(maxW <= (totalW * 0.35).toLong,
      s"salted max task must be bounded: max=$maxW total=$totalW")
    assert(nTasks >= 3, s"pair work must spread over tasks, got $nTasks")
    // exact parity with the unsalted path
    val unsalted = graft.queries.DedupQueries.fuzzyPairs(
      hotParts, "p_partkey", "p_brand", "p_name",
      targetBlockRows = Int.MaxValue)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(rows.map(key).toSet === unsalted.collect().map(key).toSet)
  }

  // ---- LSH admission join: one mass-duplicated bucket -----------------

  private lazy val hotDocs = {
    import spark.implicits._
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val copies = (0 until 300).map(i => (i.toLong, dup))
    val varied = (300 until 400).map(i =>
      (i.toLong, s"unique document number $i talks about topic ${i * 7} " +
        s"with words w${i}a w${i}b w${i}c w${i}d"))
    (copies ++ varied).toDF("doc_id", "text").cache()
  }

  private lazy val hotSig = Dedup.minhashSignatures(hotDocs, "doc_id", "text")

  test("LSH hot bucket: salted band join bounds the straggler, same pairs") {
    def run(salt: Int) = withTaskMetrics(
      Dedup.lshCandidatePairs(hotSig, threshold = 0.5, skewSalt = salt))
    val (rows1, hist1) = run(1)
    val (rows8, hist8) = run(8)
    logHist("lsh-unsalted", hist1)
    logHist("lsh-salted", hist8)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val quantum = 300 * 299 / 2 // one hot bucket's full pair load
    assert(rows1.length >= quantum, "hot cluster pairs expected")
    assert(rows8.map(key).toSet === rows1.map(key).toSet)
    // unsalted: a bucket is indivisible — some task carries at least one
    // FULL bucket quantum, and (8 band buckets over 8 partitions hashing
    // unevenly) several tasks sit idle while it runs
    val (max1, _, busy1) = pairStageStats(hist1)
    assert(max1 >= quantum,
      s"unsalted must carry a full bucket quantum: max=$max1 < $quantum")
    assert(busy1 <= 5, s"unsalted leaves tasks idle, busy=$busy1")
    // salted: quanta subdivide 8x — spread over (nearly) all tasks, no
    // full quantum anywhere, max within 2x of the mean. >= 7 (not == 8):
    // task placement of the last sub-quantum is scheduler-dependent on a
    // loaded host; the skew claim is the SPREAD, not a specific count
    val (max8, total8, busy8) = pairStageStats(hist8)
    assert(busy8 >= 7, s"salted must spread over the tasks, busy=$busy8")
    assert(max8 < quantum,
      s"salted max task must be below one bucket quantum: $max8")
    assert(max8 <= 2L * total8 / 8,
      s"salted tasks near-even: max=$max8 total=$total8")
  }

  test("SimHash band join: skew salt preserves the exact pair set") {
    val sh = Dedup.simhash(hotDocs, "doc_id", "text")
    def pairs(salt: Int) = Dedup.simhashPairs(sh, 12, skewSalt = salt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val p1 = pairs(1)
    assert(p1.size >= 300 * 299 / 2, "hot fingerprint cluster pairs expected")
    assert(pairs(8) === p1)
  }

  test("banded n-gram Jaccard: skew salt preserves the exact pair set") {
    val sig = Dedup.minhashSignatures(hotDocs, "doc_id", "text",
      numHashes = 32)
    def pairs(salt: Int) = Dedup.ngramJaccardPairsBandedFromSig(
      hotDocs, sig, "doc_id", "text", skewSalt = salt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val p1 = pairs(1)
    assert(p1.size >= 300 * 299 / 2)
    assert(pairs(4) === p1)
  }
}
