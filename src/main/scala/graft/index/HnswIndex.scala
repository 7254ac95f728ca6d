package graft.index

import scala.collection.mutable

/** In-memory HNSW graph — the per-partition local index behind
  * [[Hnsw.hnswTopK]]. Plain JVM code (deliberately not Catalyst): graph
  * construction is inherently sequential per partition (SURVEY.md §7
  * "hard parts").
  *
  * Semantics transliterated from the reference HNSWIndex
  * (vervectordb/__init__.py:17-149):
  *  - geometric level assignment with mL = 1/ln2, capped at [[LevelCap]]
  *    (`:28-29`, `:99`)
  *  - cosine similarity with zero-norm guard (`:31-36`)
  *  - greedy best-first beam `searchLayer` bounded by ef (`:38-76`)
  *  - neighbor selection = simple top-M by similarity, no diversity
  *    heuristic (`:78-89`)
  *  - bidirectional linking on insert; reverse edges are appended without
  *    pruning, so degree can exceed M (`:131-132`) — matches the reference
  *  - search implements the intended upper-level greedy descent (the
  *    reference's descent loop is dead code, `:141-144`; doing it properly
  *    only improves recall — SURVEY.md I6)
  *
  * Deterministic given insert order and seed.
  */
final class HnswIndex(m: Int = 32, efConstruction: Int = 200, seed: Long = 42L) {

  val LevelCap = 5
  private val mL = 1.0 / math.log(2.0)
  private val rng = new java.util.Random(seed)

  final class Node(val id: Long, val vector: Array[Double], val level: Int) {
    /** neighbors(l) = ids linked at level l, 0 ≤ l ≤ level. */
    val neighbors: Array[mutable.ArrayBuffer[Long]] =
      Array.fill(level + 1)(mutable.ArrayBuffer.empty[Long])
    val norm: Double = {
      var s = 0.0; var i = 0
      while (i < vector.length) { s += vector(i) * vector(i); i += 1 }
      math.sqrt(s)
    }
  }

  private val nodes = mutable.LongMap.empty[Node]
  private var entryPoint: Option[Node] = None
  private var maxLevel = 0

  def size: Int = nodes.size

  private def randomLevel(): Int =
    math.min(LevelCap, (-math.log(rng.nextDouble() max Double.MinPositiveValue) * mL).toInt)

  private def sim(a: Node, q: Array[Double], qNorm: Double): Double = {
    if (a.norm == 0.0 || qNorm == 0.0) return 0.0
    var dot = 0.0; var i = 0
    while (i < a.vector.length) { dot += a.vector(i) * q(i); i += 1 }
    dot / (a.norm * qNorm)
  }

  private def vecNorm(q: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < q.length) { s += q(i) * q(i); i += 1 }
    math.sqrt(s)
  }

  /** Greedy best-first beam search at one level, result bounded by ef.
    * Mirrors the reference's candidate max-heap / result min-heap loop with
    * early exit when the best candidate cannot improve the worst result. */
  private def searchLayer(q: Array[Double], qNorm: Double, entry: Node, ef: Int, level: Int)
      : mutable.PriorityQueue[(Double, Long)] = {
    val visited = mutable.LongMap.empty[Unit]
    // candidates: best-first (max sim first); results: worst-first (min sim first)
    val candidates = mutable.PriorityQueue.empty[(Double, Long)](Ordering.by(_._1))
    val results = mutable.PriorityQueue.empty[(Double, Long)](Ordering.by(t => -t._1))
    val eSim = sim(entry, q, qNorm)
    visited(entry.id) = ()
    candidates.enqueue((eSim, entry.id))
    results.enqueue((eSim, entry.id))
    while (candidates.nonEmpty) {
      val (cSim, cId) = candidates.dequeue()
      val worst = results.head._1
      if (cSim < worst && results.size >= ef) {
        candidates.clear() // early exit: no candidate can improve results
      } else {
        val node = nodes(cId)
        if (level <= node.level) {
          node.neighbors(level).foreach { nId =>
            if (!visited.contains(nId)) {
              visited(nId) = ()
              val n = nodes(nId)
              val s = sim(n, q, qNorm)
              if (results.size < ef || s > results.head._1) {
                candidates.enqueue((s, nId))
                results.enqueue((s, nId))
                if (results.size > ef) results.dequeue()
              }
            }
          }
        }
      }
    }
    results
  }

  /** Simple top-M by similarity (no diversity heuristic — reference
    * `select_neighbors`, `:78-89`). */
  private def selectTop(cands: Iterable[(Double, Long)], max: Int): Seq[Long] =
    cands.toSeq.sortBy(t => (-t._1, t._2)).take(max).map(_._2)

  /** Insert; duplicate id is a no-op (reference `:92-93`). */
  def insert(id: Long, vector: Array[Double]): Unit = {
    if (nodes.contains(id)) return
    val level = randomLevel()
    val node = new Node(id, vector, level)
    nodes(id) = node
    entryPoint match {
      case None =>
        entryPoint = Some(node)
        maxLevel = level
      case Some(ep) =>
        val qNorm = node.norm
        var entry = ep
        // greedy descent through levels above the new node's level
        var l = maxLevel
        while (l > level) {
          val res = searchLayer(vector, qNorm, entry, 1, l)
          if (res.nonEmpty) entry = nodes(res.maxBy(_._1)._2)
          l -= 1
        }
        // connect at each level from min(level, maxLevel) down to 0
        var lc = math.min(level, maxLevel)
        while (lc >= 0) {
          val cands = searchLayer(vector, qNorm, entry, efConstruction, lc)
          val chosen = selectTop(cands, m)
          node.neighbors(lc) ++= chosen
          chosen.foreach { nId =>
            // reverse edge appended without pruning (reference `:131-132`)
            nodes(nId).neighbors(lc) += id
          }
          if (cands.nonEmpty) entry = nodes(cands.maxBy(_._1)._2)
          lc -= 1
        }
        if (level > maxLevel) {
          maxLevel = level
          entryPoint = Some(node)
        }
    }
  }

  /** Top-k search: greedy descent from the entry point, then a level-0 beam
    * with ef = max(efSearch, 2k) (reference `:146`). */
  def search(q: Array[Double], k: Int, efSearch: Int = 200): Seq[(Long, Double)] = {
    entryPoint match {
      case None => Seq.empty
      case Some(ep) =>
        val qNorm = vecNorm(q)
        var entry = ep
        var l = maxLevel
        while (l > 0) {
          val res = searchLayer(q, qNorm, entry, 1, l)
          if (res.nonEmpty) entry = nodes(res.maxBy(_._1)._2)
          l -= 1
        }
        val ef = math.max(efSearch, 2 * k)
        searchLayer(q, qNorm, entry, ef, 0)
          .toSeq.sortBy(t => (-t._1, t._2))
          .take(k)
          .map { case (s, id) => (id, s) }
    }
  }
}
