package graft.store

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Write-path operators (reference W1–W4, W10–W11; SURVEY.md §2.2).
  *
  * DataFrames are immutable, so the reference's in-place mutations become
  * copy-on-write transformations; persistence is versioned-snapshot Parquet.
  * Unlike the reference — whose `update`/`delete` leave HNSW/IVF state stale
  * (a wrong-results bug for IVF row indices, vervectordb/__init__.py:311-335)
  * — derived index columns here are recomputed from the data they describe,
  * so staleness cannot occur by construction.
  *
  * At cluster scale the rewrite pattern is: partition the table (by cluster
  * id / bucket), rewrite only affected partitions with dynamic partition
  * overwrite, and let AQE coalesce small outputs.
  */
object VectorStore {

  /** W1/W2 `insert`/`batch_insert` (vervectordb/__init__.py:247-299).
    * Single-row insert is the degenerate batch. Enforces the reference's
    * dimension check (`:243-245`) — rows with the wrong vector length are
    * rejected with an error. */
  def insert(data: DataFrame, rows: DataFrame, dim: Int, vecCol: String = "vector"): DataFrame = {
    val checked = rows.withColumn(
      vecCol,
      when(size(col(vecCol)) === dim, col(vecCol))
        .otherwise(raise_error(concat(
          lit(s"vector dimension mismatch: expected $dim, got "),
          size(col(vecCol)).cast("string")))))
    data.unionByName(checked)
  }

  /** W3 `update` (vervectordb/__init__.py:311-322): replace vector and/or
    * metadata columns for rows matching `pred`. */
  def update(data: DataFrame, pred: Column, assignments: Map[String, Column]): DataFrame =
    assignments.foldLeft(data) { case (df, (name, value)) =>
      df.withColumn(name, when(pred, value).otherwise(col(name)))
    }

  /** W4 `delete` (vervectordb/__init__.py:324-335). */
  def delete(data: DataFrame, pred: Column): DataFrame =
    data.where(!pred)

  /** Keyed bulk MERGE — the daily-pipeline batch W3/W4's per-predicate
    * copy-on-write doesn't cover: one delta table of keyed upserts and
    * deletes applied in a single pass. `delta` carries `idCol` plus the
    * payload columns and `opCol` ∈ {"U" (update-or-insert), "D" (delete)};
    * unknown ops fail loudly at evaluation. Contract: at most one delta
    * row per id (the batch compacter's job, not a scan here).
    *
    * result = base ⟕̸ delta-keys (left anti) ∪ delta's U-rows — so an id
    * present in base updates, an absent one inserts, and a D-row removes.
    * Scale shape: ONE anti join on the id (a daily delta is bounded, so
    * AQE broadcasts it; at worst it is one hash shuffle), plus a union —
    * no per-row driver work, no second base scan. */
  def merge(base: DataFrame, delta: DataFrame, idCol: String = "id",
      opCol: String = "op"): DataFrame = {
    val d = validatedDelta(delta, opCol)
    base.join(d.select(col(idCol)), Seq(idCol), "left_anti")
      .unionByName(d.where(col(opCol) === "U").drop(opCol))
  }

  /** The delta, MATERIALIZED once and op-validated — shared by [[merge]]
    * and [[mergeVersioned]]'s bootstrap so an unknown op fails loudly on
    * EVERY path, never silently drops, and so validation and the merge
    * read the SAME evaluation.
    *
    * Why eager validation (not a `raise_error` CASE inside the plan):
    * the lazy check only survived through the `op = 'U'` branch — column
    * pruning strips it from the anti-join side, so whether an unknown op
    * failed or silently dropped its base row rested on Catalyst never
    * simplifying `CASE…raise_error END = 'U'` in the filter. An eagerly-
    * evaluated emptiness assertion cannot be optimized away by any
    * future rule. NULL ops are invalid too (a `NOT isin` filter alone
    * would pass them through to a silent drop).
    *
    * Why `localCheckpoint` (the round-14 advice finding): eager
    * validation as a SEPARATE job meant a non-deterministic delta could
    * pass validation yet merge different rows — and the merge's own two
    * branches (anti-join side, U side) could diverge from each other.
    * Checkpointing evaluates the delta exactly once (bounded by
    * [[merge]]'s contract — a daily delta, never a corpus) and cuts the
    * lineage, so the validation scan and both merge branches read the
    * materialized blocks: one evaluation, observed by all consumers.
    * Blocks are freed by the ContextCleaner once the checkpointed plan
    * is unreachable.
    *
    * Why it is GATED on replay stability (the round-16 attribution,
    * tightened by the round's review): the checkpoint materialization
    * measured ~0.4 s per merge at sf0.1 (DevTimeOne 1.14–1.34 s with vs
    * 0.72–0.99 s without — the whole r15 `vq_merge_agg` move), and for
    * a replay-STABLE delta it buys nothing: every re-evaluation
    * produces identical rows by definition. `Expression.deterministic`
    * alone is NOT that test — `dropDuplicates`/`first()` aggregates and
    * post-shuffle `limit`s report deterministic yet depend on shuffle
    * fetch order — so the gate is a conservative WHITELIST of plan
    * shapes that replay identically by construction: scans / local
    * relations / ranges composed of projects, filters, and unions whose
    * expressions are all deterministic and subquery-free. Anything else
    * (aggregate, join, window, limit, sort, distinct, sample, repartition
    * — or any unknown node) checkpoints. A UDF that lies about
    * determinism defeats this the same way it defeats every Catalyst
    * rule keyed on the same flag — Spark's own trust model, not a new
    * one. */
  private[graft] def validatedDelta(delta: DataFrame, opCol: String): DataFrame = {
    val d = if (replayStable(delta.queryExecution.analyzed)) delta
      else delta.localCheckpoint(eager = true)
    requireValidOps(d, opCol)
    d
  }

  /** Conservative replay-stability test for [[validatedDelta]]: true only
    * for plans whose every node is a stable leaf (file/table relation,
    * local rows, range) or an order-insensitive row-wise combinator
    * (project / filter / union / alias), with all expressions
    * deterministic and subquery-free.
    *
    * RDD-backed leaves carry NO determinism metadata in the plan (an
    * arbitrary `createDataFrame(rdd)` lineage never passes through
    * `Expression.deterministic`), so a [[LogicalRDD]] counts as stable
    * only when the rows themselves are pinned — the RDD is checkpointed
    * (what `localCheckpoint(eager = true)` produces) or persisted at a
    * disk-backed level that survives block eviction. An
    * [[InMemoryRelation]] at a memory-only level RECOMPUTES its child on
    * eviction, so it is stable only if disk-backed or if the cached
    * child's plan is itself replay-stable (recursed — the cache is then
    * a pure accelerator over a stable computation). */
  private[graft] def replayStable(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def exprsOk(p: LogicalPlan): Boolean = p.expressions.forall(e =>
      e.deterministic && !e.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
    def nodeOk(p: LogicalPlan): Boolean = p match {
      case _: Project | _: Filter | _: Union | _: SubqueryAlias => true
      case _: LocalRelation | _: Range | _: OneRowRelation => true
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.isCheckpointed || l.rdd.getStorageLevel.useDisk
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        r.cacheBuilder.storageLevel.useDisk ||
          replayStable(r.cacheBuilder.logicalPlan)
      case _ => false
    }
    plan.collect { case p => p }.forall(p => nodeOk(p) && exprsOk(p))
  }

  /** The scan-only op check of [[validatedDelta]], also used directly on
    * streaming micro-batches ([[graft.streaming.StreamingIngest]]'s CDC
    * twin) whose rows the streaming engine has ALREADY materialized — no
    * re-evaluation risk there, so no checkpoint needed. */
  private[graft] def requireValidOps(delta: DataFrame, opCol: String): Unit = {
    val bad = delta
      .where(col(opCol).isNull || !col(opCol).isin("U", "D"))
      .select(col(opCol)).limit(1).collect()
    require(bad.isEmpty, s"unknown merge op: ${bad.headOption.map(_.get(0)).orNull}")
  }

  /** [[merge]] landed as one commit-marker version on a
    * [[VersionedLayout]] root: reads the live snapshot, applies the
    * delta, publishes the result as the next version — readers keep the
    * old snapshot until the marker lands, a crash mid-write leaves an
    * uncommitted directory the next publish deletes (no torn version is
    * ever visible), and the writer lock rejects a concurrent merge
    * loudly. First merge on an empty root bootstraps from the delta's
    * U-rows. Returns the committed version dir. */
  def mergeVersioned(spark: SparkSession, root: String, delta: DataFrame,
      idCol: String = "id", opCol: String = "op"): String =
    VersionedLayout.publish(spark, root) { dir =>
      val merged = VersionedLayout.currentDir(spark, root) match {
        case Some(cur) => merge(spark.read.parquet(cur), delta, idCol, opCol)
        case None =>
          validatedDelta(delta, opCol).where(col(opCol) === "U").drop(opCol)
      }
      merged.write.parquet(dir)
    }

  /** Time-travel (AS-OF) read on a [[VersionedLayout]] root: the
    * committed snapshot at `version`, stable while later merges land —
    * the operational primitive a 100 TB pipeline uses to pin a training
    * run to one snapshot while ingestion continues. Version directories
    * are immutable once committed (publishes only add, pruning removes
    * whole old dirs), so the returned frame keeps reading exactly that
    * snapshot. Fails loudly — naming the versions still available — for
    * a version that was never committed, is torn (no commit marker), or
    * was pruned past [[VersionedLayout.Keep]]; a torn version is
    * INVISIBLE here exactly as it is to the live reader. */
  def readVersion(spark: SparkSession, root: String, version: Int): DataFrame =
    VersionedLayout.versionDir(spark, root, version) match {
      case Some(dir) => spark.read.parquet(dir)
      case None =>
        val have = VersionedLayout.committedVersions(spark, root)
        throw new IllegalArgumentException(
          s"no committed version $version under $root (committed: " +
            s"${if (have.isEmpty) "<none>" else have.mkString(", ")}) — " +
            "never published, torn, or pruned past the retention window")
    }

  /** Committed version numbers under `root`, ascending ([[readVersion]]'s
    * catalog). */
  def versions(spark: SparkSession, root: String): Seq[Int] =
    VersionedLayout.committedVersions(spark, root)

  /** W10 `save` (vervectordb/__init__.py:556-573): data → columnar files;
    * small model state (centroids, codebooks) is the caller's sidecar.
    * Parquet is the default (columnar, predicate/column pushdown); json/csv
    * supported for interchange (csv cannot carry array columns — project
    * scalars first). */
  def save(data: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      format: String = "parquet"): Unit = {
    val w = data.write.mode(SaveMode.Overwrite).format(format)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  /** W11 `load` (vervectordb/__init__.py:575-594). Non-parquet formats need
    * the schema supplied to avoid lossy inference. */
  def load(spark: SparkSession, path: String, format: String = "parquet",
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    schema.fold(r)(s => r.schema(s)).load(path)
  }

  /** Bucketed save: hash-bucket (and sort) the table by a join key so that
    * subsequent joins/aggregations on that key run with NO shuffle — two
    * tables bucketed the same way sort-merge-join exchange-free. At 100 TB
    * this is the difference between a join that moves the whole table and
    * one that moves nothing; asserted in PlanSpec. */
  def saveBucketed(data: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int = 16): Unit =
    data.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)
}
