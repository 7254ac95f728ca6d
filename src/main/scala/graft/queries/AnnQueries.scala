package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.search.VectorSearch

/** Similarity-search queries over the `embeddings` table. The exact
  * brute-force scan is the oracle-backed baseline; IVF/HNSW approximate
  * variants live in graft.index and are recall-gated in ScalaTest. */
object AnnQueries {

  /** Exact cosine top-20 over embeddings vs the fixed 64-d query. */
  def bruteTopK(spark: SparkSession, dir: String): DataFrame =
    VectorSearch.bruteForceTopK(
      VectorModel.embeddings(spark, dir), VectorModel.AnnQuery, 20,
      vecCol = "embedding", idCol = "vec_id")
      .select("vec_id", "sim")

  val bruteTopKSql: String = {
    val sim = OracleSql.cosineConst(OracleSql.listElem("embedding"), VectorModel.AnnQuery)
    s"""SELECT vec_id, round($sim, 6) AS sim
       |FROM embeddings ORDER BY sim DESC, vec_id ASC LIMIT 20""".stripMargin
  }

  /** S5 keyword-filtered ANN: filter documents by keyword (case-insensitive
    * substring, OR semantics — vervectordb/__init__.py:540-544), join to
    * their embeddings, exact top-10. Filter-first: the predicate and column
    * pruning reach the scans before the similarity ranking. */
  def keywordAnn(spark: SparkSession, dir: String): DataFrame = {
    val keywords = Seq("window", "stream")
    val docs = VectorModel.documents(spark, dir)
      .where(VectorSearch.keywordPredicate(col("text"), keywords))
      .select(col("doc_id"))
    val joined = VectorModel.embeddings(spark, dir)
      .join(docs, col("vec_id") === col("doc_id"))
    VectorSearch.bruteForceTopK(joined, VectorModel.AnnQuery, 10,
      vecCol = "embedding", idCol = "vec_id")
      .select("vec_id", "sim")
  }

  val keywordAnnSql: String = {
    val sim = OracleSql.cosineConst(OracleSql.listElem("embedding"), VectorModel.AnnQuery)
    s"""SELECT vec_id, round($sim, 6) AS sim
       |FROM embeddings JOIN (
       |  SELECT doc_id FROM documents
       |  WHERE contains(lower(text), 'window') OR contains(lower(text), 'stream')
       |) d ON vec_id = d.doc_id
       |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin
  }

  /** Blocked k-NN similarity join: for EVERY embedding, its top-3 cosine
    * neighbors within its label block (self excluded) — the per-row
    * similarity-join shape of a near-dup/retrieval pipeline. Pairwise sims
    * flow through the fused cosine_sim expression; ranking is the
    * k-bounded aggregator (map-side truncation), so the shuffle after the
    * blocked join carries ≤ k rows per vector per task. */
  def knnJoin(spark: SparkSession, dir: String): DataFrame = {
    val emb = VectorModel.embeddings(spark, dir)
    // Round-robin widen + broadcast build: label has only 10 distinct
    // values, so hash-widening by it would skew; see Dedup.embeddingNearDupPairs.
    val joined = graft.operators.Par.widen(emb).as("a").join(broadcast(emb).as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("query_id"),
        col("b.vec_id").as("id"),
        graft.GraftExtensions.cosineSim(col("a.embedding"), col("b.embedding")).as("sim_raw"))
    graft.operators.TopK.perGroupTopK(joined, "query_id", col("id"), col("sim_raw"), 3)
      .withColumnRenamed("query_id", "vec_id")
      .withColumnRenamed("id", "neighbor_id")
      .orderBy("vec_id", "rn")
  }

  val knnJoinSql: String = {
    val sim = OracleSql.cosineCols(
      OracleSql.listElem("a.embedding"), OracleSql.listElem("b.embedding"),
      VectorModel.EmbDim)
    s"""SELECT vec_id, neighbor_id, round(sim_raw, 6) AS sim, rn FROM (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id, $sim AS sim_raw,
       |    CAST(row_number() OVER (PARTITION BY a.vec_id
       |      ORDER BY $sim DESC, b.vec_id ASC) AS BIGINT) AS rn
       |  FROM embeddings a JOIN embeddings b
       |    ON a.label = b.label AND a.vec_id <> b.vec_id)
       |WHERE rn <= 3 ORDER BY vec_id, rn""".stripMargin
  }

  /** IVF-bucketed approximate k-NN join — the scale path for [[knnJoin]]
    * (which broadcasts a whole table as build side and therefore stops at
    * the broadcast limit): probe-cluster equi-join, no broadcast of data,
    * co-partitioned on cluster_id ([[graft.index.Ivf.knnJoin]]). Unblocked
    * (global neighbors, not per-label); recall-gated in RecallSpec. */
  def ivfKnnJoin(spark: SparkSession, dir: String): DataFrame = {
    val emb = VectorModel.embeddings(spark, dir)
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val (_, model) = graft.index.Ivf.fit(emb, vecCol = "embedding", idCol = "vec_id")
    // the SAME seeded fit ann_ivf_topk publishes — repair no-op usually
    ApproxQueries.publishCentroidsFlat(spark, "ivf_centroids_emb", dir, model.centroids)
    graft.index.Ivf.knnJoin(emb, model, 3, nProbes = 2,
      vecCol = "embedding", idCol = "vec_id")
      .withColumnRenamed("query_id", "vec_id")
      .withColumnRenamed("id", "neighbor_id")
      .orderBy("vec_id", "rn")
  }

  /** HASH-GATE of [[ivfKnnJoin]] GIVEN the published embeddings-family
    * centroids: every row's top-2 probe clusters (centroid cosine, ties
    * to the lower id), candidates = the re-derived assignment of the
    * probed clusters minus self, raw-cosine rank to k=3, rounded output
    * — the approximate k-NN SELF-join re-derived end to end. */
  lazy val ivfKnnJoinSql: String = {
    val d = VectorModel.EmbDim
    def cE(i: Int) = s"cent.c$i"
    def qE(i: Int) = OracleSql.listElem("q.embedding")(i)
    def dE(i: Int) = OracleSql.listElem("e.embedding")(i)
    s"""WITH cent AS (SELECT CAST(cluster_id AS INTEGER) AS cluster_id,
       |    ${(0 until d).map(j => s"c$j").mkString(", ")}
       |  FROM ${OracleSidecars.sqlTable("ivf_centroids_emb")}),
       |asg AS (SELECT vec_id, cluster_id FROM (
       |  SELECT a.vec_id, cent.cluster_id,
       |    row_number() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${OracleSql.l2sq(cE, i => OracleSql.listElem("a.embedding")(i), d)} ASC, cent.cluster_id ASC) AS arn
       |  FROM embeddings a CROSS JOIN cent) WHERE arn = 1),
       |pr AS (SELECT vec_id, cluster_id FROM (
       |  SELECT q.vec_id, cent.cluster_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${OracleSql.cosineCols(cE, qE, d)} DESC, cent.cluster_id ASC) AS prn
       |  FROM embeddings q CROSS JOIN cent) WHERE prn <= 2),
       |sc AS (SELECT p.vec_id AS vec_id, a2.vec_id AS neighbor_id,
       |    ${OracleSql.cosineCols(qE, dE, d)} AS sim_raw
       |  FROM pr p
       |    JOIN asg a2 ON a2.cluster_id = p.cluster_id AND a2.vec_id <> p.vec_id
       |    JOIN embeddings q ON q.vec_id = p.vec_id
       |    JOIN embeddings e ON e.vec_id = a2.vec_id)
       |SELECT vec_id, neighbor_id, round(sim_raw, 6) AS sim, rn FROM (
       |  SELECT vec_id, neighbor_id, sim_raw,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY sim_raw DESC, neighbor_id ASC) AS rn
       |  FROM sc)
       |WHERE rn <= 3 ORDER BY vec_id, rn""".stripMargin
  }

  /** List length each retriever contributes to the fusion. */
  private val RrfN = 50
  private val RrfK = 60

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical top-50
    * (over `documents`) and the exact cosine top-50 (over the aligned
    * `embeddings` rows) — the standard two-tower retrieval shape
    * (Cormack et al., SIGIR 2009: rrf = Σ 1/(60 + rank)). Both input
    * ranks order by the ROUNDED scores with id tie-breaks, so ranks —
    * and therefore the fused scores — are engine-exact. The rank windows
    * are unpartitioned but BOUNDED: they run over the two top-N lists
    * (N=50), never the corpus. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = graft.text.Bm25.topK(
      VectorModel.documents(spark, dir), TextQueries.Bm25Terms, RrfN)
      .withColumn("lr", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("lr"))
    val vec = VectorSearch.bruteForceTopK(
      VectorModel.embeddings(spark, dir), VectorModel.AnnQuery, RrfN,
      vecCol = "embedding", idCol = "vec_id")
      .withColumn("vr", row_number().over(
        Window.orderBy(col("sim").desc, col("vec_id").asc)))
      .select(col("vec_id"), col("vr"))
    lex.join(vec, col("doc_id") === col("vec_id"), "full_outer")
      .select(
        coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
        round(
          coalesce(lit(1.0) / (lit(RrfK) + col("lr")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("vr")), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(15)
  }

  lazy val hybridRrfSql: String = {
    val one = OracleSql.lit(1.0)
    val zero = OracleSql.lit(0.0)
    val sim = OracleSql.cosineConst(OracleSql.listElem("embedding"), VectorModel.AnnQuery)
    s"""WITH lex AS (${TextQueries.bm25Sql(RrfN)}),
       |lexr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS lr FROM lex),
       |vec AS (SELECT vec_id, round($sim, 6) AS sim
       |        FROM embeddings ORDER BY sim DESC, vec_id ASC LIMIT $RrfN),
       |vecr AS (SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS vr FROM vec)
       |SELECT COALESCE(l.doc_id, v.vec_id) AS doc_id,
       |  round(COALESCE($one/($RrfK + lr), $zero) + COALESCE($one/($RrfK + vr), $zero), 6) AS rrf
       |FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.vec_id
       |ORDER BY rrf DESC, doc_id ASC LIMIT 15""".stripMargin
  }

  /** MaxSim query facets — short keyword spans over the corpus vocabulary,
    * one per aspect, embedded with the same hash embedder as the chunks. */
  val MaxSimQueries: Seq[String] =
    Seq("vector index search", "stream window merge", "sort join table")

  /** Late-interaction retrieval ([[graft.search.MaxSim]]): chunk every
    * document with the pipeline's chunker, hash-embed the chunks (the
    * `tx_chunks`/`tx_embed` machinery), score docs by Σ_facet max-chunk
    * cosine. Hash-gated: chunking, embedding, and the MaxSim arithmetic
    * all have exact mirrors. */
  def maxSimTopK(spark: SparkSession, dir: String): DataFrame = {
    val embedder = new graft.text.HashEmbedder(TextQueries.EmbedDim)
    val chunkVecs = VectorModel.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.text.TextAnalysis.chunks(col("text"),
          TextQueries.ChunkSize, TextQueries.ChunkStride)).as("chunk"))
      .select(col("doc_id"), embedder.embed(col("chunk")).as("cvec"))
    val qvecs = MaxSimQueries.map(q =>
      spark.range(1).select(embedder.embed(lit(q)).as("v"))
        .head.getSeq[Double](0).toSeq)
    graft.search.MaxSim.topK(chunkVecs, qvecs, 10, "doc_id", "cvec")
  }

  lazy val maxSimTopKSql: String = {
    val d = TextQueries.EmbedDim
    val qValues = MaxSimQueries.zipWithIndex
      .map { case (q, i) => s"($i, '$q')" }.mkString(", ")
    val facetMaxes = MaxSimQueries.indices
      .map(i => s"max(CASE WHEN qid = $i THEN sim END) AS m$i").mkString(",\n  ")
    val score = MaxSimQueries.indices.map(i => s"m$i").reduceLeft((a, b) => s"($a + $b)")
    val sim = OracleSql.cosineCols(i => s"c.e$i", i => s"q.e$i", d)
    s"""WITH ch AS (
       |  SELECT doc_id,
       |    array_to_string(toks[s+1 : s+${TextQueries.ChunkSize}], ' ') AS chunk
       |  FROM (SELECT doc_id, toks,
       |          unnest(range(0, len(toks), ${TextQueries.ChunkStride})) AS s
       |        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))),
       |chh AS (SELECT doc_id, ${TextQueries.hashListSql("chunk")} AS hs FROM ch),
       |che AS (SELECT doc_id, ${TextQueries.hashFeatureComps} FROM chh),
       |qs AS (SELECT * FROM (VALUES $qValues) v(qid, qtext)),
       |qh AS (SELECT qid, ${TextQueries.hashListSql("qtext")} AS hs FROM qs),
       |qe AS (SELECT qid, ${TextQueries.hashFeatureComps} FROM qh),
       |sims AS (
       |  SELECT c.doc_id AS doc_id, q.qid AS qid, $sim AS sim
       |  FROM che c CROSS JOIN qe q),
       |mx AS (SELECT doc_id, $facetMaxes FROM sims GROUP BY doc_id)
       |SELECT doc_id, round($score, 6) AS maxsim
       |FROM mx ORDER BY maxsim DESC, doc_id ASC LIMIT 10""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_maxsim_topk" -> (maxSimTopK _),
    "ann_hybrid_rrf" -> (hybridRrf _),
    "ann_brute_topk" -> (bruteTopK _),
    "ann_keyword_topk" -> (keywordAnn _),
    "ann_ivf_knn_join" -> (ivfKnnJoin _),
    "ann_knn_join" -> (knnJoin _))

  val oracleSql: Map[String, String] = Map(
    "ann_maxsim_topk" -> maxSimTopKSql,
    "ann_hybrid_rrf" -> hybridRrfSql,
    "ann_brute_topk" -> bruteTopKSql,
    "ann_keyword_topk" -> keywordAnnSql,
    "ann_knn_join" -> knnJoinSql,
    "ann_ivf_knn_join" -> ivfKnnJoinSql)
}
