package graft.search

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded candidate-id fetch for two-stage vector search — the re-rank
  * stage's point-lookup workload done as a PRUNED scan instead of an
  * unpruned full-table join probe.
  *
  * The two-stage codecs (PCA subspace, 1-bit Hamming — `graft.pq.Pca`,
  * `graft.pq.BinaryQuantizer`) cut a CONSTANT candidate count in their
  * coarse stage, then need those candidates' full vectors for the exact
  * re-rank. Joining the candidate set against the vector table broadcasts
  * the small side but still SCANS the whole table as the probe side — at
  * 100 TB that re-reads the entire full-width corpus to fetch a few
  * hundred rows, strictly worse I/O than the coarse stage it exists to
  * avoid. The fix is to exploit the bound: the candidate set is
  * driver-bounded by construction (`LIMIT rerank`, or queries × rerank),
  * so collect the ids and push `id IN (…)` INTO the scan.
  *
  * What the pushed predicate buys, layer by layer, on a layout written by
  * [[writeIdClustered]] (range-partitioned + sorted by id, parquet bloom
  * filter on the id column):
  *
  *  - '''row-group stats''': the sort gives every row group a tight
  *    disjoint id `[min,max]`; an `IN` list drops every row group whose
  *    range contains none of the values. Candidates are scattered, so at
  *    scale this reads ≤ |ids| row groups — I/O proportional to the
  *    CANDIDATE COUNT, not the corpus (the `q_zorder_box` footer-stat
  *    machinery, applied to point fetches).
  *  - '''page/column indexes''': within a touched row group, the parquet
  *    column index narrows to the ~one page per candidate.
  *  - '''bloom filter''': catches what stats cannot when a file's range
  *    is wide (e.g. after compaction mixed id ranges) — a row group whose
  *    bloom rejects all values is skipped without decoding.
  *
  * The `IN` must survive to the parquet reader as a REAL value list:
  * above `spark.sql.parquet.pushdown.inFilterThreshold` (default 10)
  * Spark degrades the pushed filter to `min(ids) <= id <= max(ids)`,
  * which a scattered candidate set stretches over the whole domain —
  * every entry session raises the threshold past the largest candidate
  * set ([[InFilterThreshold]]).
  *
  * Determinism: the fetch is a filter, not a sample — result content is
  * the same rows the join produced, so the hash-gated oracles are
  * unaffected. IdFetchSpec measures the pruning (files a stats reader
  * must touch) and the parity (fetch == join) on a planted layout.
  */
object IdFetch {

  /** Session value for `spark.sql.parquet.pushdown.inFilterThreshold`:
    * must exceed the largest candidate fetch (batch worst case =
    * queries × rerank = 8 × 400 = 3200). */
  val InFilterThreshold = 4096

  /** Write `(id, payload…)` clustered by id: range-partition into
    * `numFiles` tasks, sort within each — every file and row group gets a
    * tight disjoint id range for stats pruning — and enable the parquet
    * bloom filter on the id column for the ranges stats cannot serve.
    * Production sizing: one file per ~128 MB; `numFiles` here is the
    * local-mode stand-in. */
  def writeIdClustered(df: DataFrame, path: String, idCol: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$idCol", "true")
      .parquet(path)

  /** The pruned fetch: `WHERE id IN (ids)` pushed into the scan. Empty
    * candidate set short-circuits to an empty frame of the same schema
    * (an empty `IN` list is not a valid pushdown).
    *
    * The fetch itself never mutates session state: the parquet `IN`
    * threshold is a SESSION-GLOBAL conf, and raising it per call races
    * with every other query planned concurrently in the same session
    * (and leaks the raised value to unrelated queries afterward). Entry
    * sessions set [[InFilterThreshold]] at build time — every builder
    * (Verify, Bench, RecallBench, the shared spec session, DevTimeOne,
    * DevPlans) pipes through [[configure]], the one owner of the key;
    * a session left at the default degrades GRACEFULLY, not wrongly:
    * the filter still applies (as an `InSet` after the scan), only the
    * parquet-side pushdown falls back to Spark's min/max range —
    * unpruned, never incorrect. The same graceful degradation covers a
    * candidate list past the configured threshold. */
  def fetchByIds(vecs: DataFrame, idCol: String, ids: Seq[Any]): DataFrame = {
    if (ids.isEmpty) vecs.where(lit(false))
    else vecs.where(col(idCol).isin(ids: _*))
  }

  /** Apply the point-fetch session conf to a builder — ONE place owns the
    * threshold value, every entry session (Verify, Bench, RecallBench,
    * the shared spec session) composes it at build time, so concurrent
    * query planning never sees a mid-flight conf mutation. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.parquet.pushdown.inFilterThreshold",
      InFilterThreshold.toString)

  /** Rebuild a COLLECTED bounded candidate set as a small local
    * DataFrame (for re-attaching per-candidate columns — coarse distance,
    * query assignment — to the fetched rows). Collecting then rebuilding,
    * rather than reusing the candidate frame, is what keeps the coarse
    * scan from executing twice. */
  def localFrame(vecs: DataFrame, rows: Array[Row],
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import scala.jdk.CollectionConverters._
    vecs.sparkSession.createDataFrame(rows.toSeq.asJava, schema)
  }
}
