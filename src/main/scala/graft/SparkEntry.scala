package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.VectorModel
import graft.queries.{AnalyticsQueries, AnnQueries, ApproxQueries, DedupQueries, MultimodalQueries, PipelineQueries, TextQueries, VectorQueries}
import graft.search.VectorSearch

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every operator module's query map; `oracleSql`
  * carries the DuckDB mirror for the exact/deterministic subset (approximate
  * operators — HNSW/IVF/PQ/LSH — are recall-gated in ScalaTest instead, per
  * SURVEY.md §5).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    VectorSearch.bruteForceTopK(
      VectorModel.lineitemVectors(spark, "/root/testdata/sf0.001"),
      VectorModel.Query, 10)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    VectorQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      AnnQueries.queries ++ AnalyticsQueries.queries ++ MultimodalQueries.queries ++
      ApproxQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    VectorQueries.oracleSql ++ TextQueries.oracleSql ++ DedupQueries.oracleSql ++
      AnnQueries.oracleSql ++ AnalyticsQueries.oracleSql ++ MultimodalQueries.oracleSql ++
      ApproxQueries.oracleSql ++ PipelineQueries.oracleSql
}
