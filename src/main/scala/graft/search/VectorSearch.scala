package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Exact search operators (reference S1/S4/S5/S6, SURVEY.md §2.1).
  *
  * Spark-first design notes:
  *  - Top-k = `orderBy(...).limit(k)` → Catalyst plans `TakeOrderedAndProject`
  *    (bounded per-partition heap + driver merge — no full sort, no shuffle).
  *  - Filters are plain `Column` predicates applied *before* the ranking, so
  *    Catalyst pushes them into the Parquet scan. This is deliberately exact,
  *    unlike the reference's overfetch-then-filter (`top_k*3`,
  *    vervectordb/__init__.py:345,386,470) which can drop matches — see
  *    SURVEY.md §2 "overfetch semantics note".
  *  - All similarity math expands to codegen'd built-in expressions.
  */
object VectorSearch {

  /** S1 `brute_force_search` (vervectordb/__init__.py:337-365): exact top-k
    * by cosine similarity vs a constant query vector. Deterministic
    * tie-break by id. */
  def bruteForceTopK(
      data: DataFrame,
      query: Seq[Double],
      k: Int,
      filter: Option[Column] = None,
      vecCol: String = "vector",
      idCol: String = "id"): DataFrame = {
    val base = filter.foldLeft(data)((d, f) => d.where(f))
    base
      .withColumn("sim", round(VectorFunctions.cosineConst(col(vecCol), query), 6))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** S4 `batch_search` (vervectordb/__init__.py:517-536): top-k per query.
    * The query set is small → broadcast cross join (no shuffle of the data
    * side for the join itself); ranking is a k-bounded custom aggregator
    * ([[graft.operators.TopK]]) so partial aggregation truncates to k rows
    * per query map-side — the shuffle carries O(queries·k·tasks) rows, not
    * the whole joined table. Unlike the reference, queries run in one
    * distributed job rather than a serial per-query loop. */
  def batchTopK(
      data: DataFrame,
      queries: DataFrame,
      dim: Int,
      k: Int,
      vecCol: String = "vector",
      idCol: String = "id",
      queryIdCol: String = "query_id",
      queryVecCol: String = "qvec"): DataFrame = {
    // Probe-side parallelism guard: the cross join multiplies work by
    // |queries|, so a narrow (small-file) data scan must be widened first.
    val joined = graft.operators.Par.widen(data).crossJoin(broadcast(queries))
      .withColumn("sim_raw",
        graft.GraftExtensions.cosineSim(col(vecCol), col(queryVecCol)))
    graft.operators.TopK.perGroupTopK(joined, queryIdCol, col(idCol), col("sim_raw"), k)
      .withColumnRenamed("id", idCol)
  }

  /** Window-ranking formulation of batch top-k — the shuffle-everything
    * baseline the aggregator is tested against. */
  def batchTopKWindow(
      data: DataFrame,
      queries: DataFrame,
      k: Int,
      vecCol: String = "vector",
      idCol: String = "id",
      queryIdCol: String = "query_id",
      queryVecCol: String = "qvec"): DataFrame = {
    val joined = data.crossJoin(broadcast(queries))
      .withColumn("sim_raw",
        graft.GraftExtensions.cosineSim(col(vecCol), col(queryVecCol)))
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("sim_raw").desc, col(idCol).asc)
    joined
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .select(col(queryIdCol), col(idCol), round(col("sim_raw"), 6).as("sim"), col("rn"))
  }

  /** Range (radius) search — every row whose cosine similarity to the
    * query clears `minSim`, ordered (sim DESC, id ASC). The similarity
    * threshold is applied on the 6-dp-rounded similarity, the same value
    * the row reports, so the cut is exactly reproducible from the output.
    * An extension past the reference (whose API is top-k only): the
    * match-everything-above-a-bar shape a dedup/recall audit runs.
    *
    * Scale: one scan, predicate evaluated inside whole-stage codegen; the
    * sort touches only survivors (a threshold this shape selects a tiny
    * fraction — the operator is for high bars, not table dumps).
    *
    * The similarity runs through the FUSED [[CosineSimilarity]] kernel
    * (bit-identical to the expanded form), not
    * [[VectorFunctions.cosineConst]]: the filter-above-projection shape
    * makes Catalyst substitute the sim expression into the predicate, so
    * the expanded spelling lands TWICE in one generated method — past the
    * JIT's compilation limit, and the stage drops to the interpreter
    * (measured 0.17 s → 18 s on the sf0.1 scan). The kernel is one loop
    * regardless of duplication. */
  def rangeSearch(
      data: DataFrame,
      query: Seq[Double],
      minSim: Double,
      filter: Option[Column] = None,
      vecCol: String = "vector",
      idCol: String = "id"): DataFrame = {
    val base = filter.foldLeft(data)((d, f) => d.where(f))
    val q = array(query.map(lit): _*)
    base
      .withColumn("sim",
        round(graft.GraftExtensions.cosineSim(col(vecCol), q), 6))
      .where(col("sim") >= minSim)
      .orderBy(col("sim").desc, col(idCol).asc)
  }

  /** JVM mirrors of the oracle's cosine arithmetic
    * ([[graft.queries.OracleSql.cosineCols]]): left-associated dot and
    * norms, zero-norm → 0.0 guard — IEEE-identical to the SQL expansion,
    * which is what lets the driver-side MMR greedy stay hash-gated. */
  private[graft] def cosPair(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); i += 1 }
    i = 0
    while (i < a.length) { na += a(i) * a(i); i += 1 }
    i = 0
    while (i < b.length) { nb += b(i) * b(i); i += 1 }
    val sa = math.sqrt(na); val sb = math.sqrt(nb)
    if (sa == 0.0 || sb == 0.0) 0.0 else dot / (sa * sb)
  }

  /** MMR (maximal marginal relevance) diversified top-k: greedily pick k
    * results maximizing `λ·sim(q,d) − (1−λ)·max_{s∈S} cos(d,s)` over a
    * `poolSize` exact-top candidate pool. The pool fetch is the
    * distributed part (TakeOrderedAndProject over the full table); the
    * greedy is inherently sequential over ≤ poolSize rows and runs on the
    * driver — bounded small-side, like a query set. Deterministic: pool
    * ranked on the 6-dp-rounded sim with id tie-break, greedy ties go to
    * the smaller id. */
  def mmrTopK(
      data: DataFrame,
      query: Seq[Double],
      k: Int,
      poolSize: Int = 50,
      lambda: Double = 0.5,
      vecCol: String = "vector",
      idCol: String = "id"): DataFrame = {
    val spark = data.sparkSession
    val pool = data
      .withColumn("sim", round(VectorFunctions.cosineConst(col(vecCol), query), 6))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(poolSize)
      .select(col(idCol).cast("long"), col("sim"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Array[Double])]
    val remaining = scala.collection.mutable.ArrayBuffer(pool.toSeq: _*)
    while (selected.size < k && remaining.nonEmpty) {
      var bi = 0
      var bs = Double.NegativeInfinity
      var i = 0
      while (i < remaining.size) {
        val (id, sim, vec) = remaining(i)
        val score =
          if (selected.isEmpty) sim
          else {
            var m = cosPair(vec, selected(0)._3)
            var j = 1
            while (j < selected.size) {
              val c = cosPair(vec, selected(j)._3)
              if (c > m) m = c
              j += 1
            }
            lambda * sim - (1.0 - lambda) * m
          }
        if (score > bs || (score == bs && id < remaining(bi)._1)) { bs = score; bi = i }
        i += 1
      }
      selected += remaining.remove(bi)
    }
    import spark.implicits._
    selected.toSeq.zipWithIndex
      .map { case ((id, sim, _), i) => ((i + 1).toLong, id, sim) }
      .toDF("mmr_rank", idCol, "sim")
  }

  /** S5 `filtered_search` keyword predicate (vervectordb/__init__.py:538-554):
    * case-insensitive substring match, OR across keywords. Returns a Column
    * usable as the `filter` of any search operator. */
  def keywordPredicate(textCol: Column, keywords: Seq[String]): Column =
    keywords.map(kw => lower(textCol).contains(kw.toLowerCase)).reduceLeft(_ || _)

  /** S6 `get_by_id` (vervectordb/__init__.py:301-309): point lookup. Absence
    * handling (reference raises KeyError) is the caller's concern — an empty
    * DataFrame is returned. */
  def getById(data: DataFrame, id: Long, idCol: String = "id"): DataFrame =
    data.where(col(idCol) === id)
}
