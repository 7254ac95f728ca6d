package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Par

/** BM25 keyword-relevance ranking over a document corpus — the lexical
  * retrieval half of the RAG pipeline the reference evidences but never
  * wrote (jieba + GTE deps, SURVEY.md intro; its shipped surface only has
  * substring keyword filtering, vervectordb/__init__.py:540-544).
  *
  * Okapi BM25 with the Lucene idf variant:
  * score(d, q) = Σ_t ln(1 + (N − df_t + ½)/(df_t + ½)) ·
  *               tf · (k1+1) / (tf + k1 · (1 − b + b · dl/avgdl))
  *
  * Scale shape (100 TB):
  *  - tokens are filtered to the query's terms BEFORE the tf groupBy, so
  *    the only shuffles carry O(matching doc-term) rows, not the corpus;
  *  - corpus stats (N, Σdl) and per-term df are tiny aggregates,
  *    broadcast back — no skew, no wide join;
  *  - final ranking is `TakeOrderedAndProject` on the rounded score.
  *
  * Determinism: everything is integer counts and IEEE double arithmetic
  * mirrored term-for-term in the DuckDB oracle; ranking uses the ROUNDED
  * score (6 dp) in both engines so a last-ulp `ln` difference between
  * libm implementations cannot reorder the top-k.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Per-(doc, term) BM25 weights for `queryTerms`, plus the corpus stats
    * the score needs. Exposed for reuse; [[topK]] sums and ranks. */
  def termWeights(docs: DataFrame, queryTerms: Seq[String],
      idCol: String, textCol: String): DataFrame = {
    val base = Par.widen(docs)
      .select(col(idCol).as("doc"), split(lower(col(textCol)), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val stats = base.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = base
      .select(col("doc"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy("doc", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nD = col("n_docs").cast("double")
    val dfD = col("df").cast("double")
    val tfD = col("tf").cast("double")
    val avgdl = col("sum_dl").cast("double") / nD
    val idf = log((nD - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
    val norm = tfD + lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("dl").cast("double") / avgdl)
    tf.join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .withColumn("w", idf * (tfD * lit(K1 + 1.0)) / norm)
  }

  /** Top-k documents by BM25 score for a bag of query terms. */
  def topK(docs: DataFrame, queryTerms: Seq[String], k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    termWeights(docs, queryTerms, idCol, textCol)
      .groupBy("doc")
      .agg(round(sum(col("w")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc").asc)
      .limit(k)
      .select(col("doc").as(idCol), col("bm25"))
}
