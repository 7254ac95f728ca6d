package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.model.VectorModel
import graft.queries.DedupQueries

/** The persisted component layouts (build-once/serve-many star-contraction
  * output) and their delta-maintenance move: a layout scan must be
  * value-identical to a fresh contraction, serving must actually BE a
  * scan (no iterative join loop in the plan), and incremental
  * re-propagation over a grown pair set must equal re-contracting from
  * scratch. */
class ComponentLayoutSpec extends SparkSpec {

  private def labelMap(df: org.apache.spark.sql.DataFrame,
      idCol: String): Map[Long, Long] =
    df.select(col(idCol), col("component")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("component layout equals a fresh contraction of the pair layout") {
    val docs = VectorModel.documents(spark, Sf0001)
    val pairs = spark.read.parquet(DedupQueries.pairLayout(spark, Sf0001))
    val fresh = labelMap(
      Dedup.connectedComponents(docs, "doc_id", pairs), "doc_id")
    val served = labelMap(DedupQueries.components(spark, Sf0001), "doc_id")
    assert(served === fresh)
    assert(served.size === docs.count(),
      "the layout stores the FULL assignment — one row per doc")
  }

  test("serving components is a layout scan, not a contraction loop") {
    // the whole point of the build step: the serve plan is one parquet
    // scan (plus the presentation sort) — no joins, no aggregation
    val plan = DedupQueries.components(spark, Sf0001)
      .queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty,
      s"component serve must not join/contract at query time:\n$plan")
  }

  test("semantic cc layouts equal fresh contractions (exact and ivf pair sets)") {
    val emb = VectorModel.embeddings(spark, Sf0001)
    val exactPairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
      "label", VectorModel.EmbDim, 0.4, broadcastBuild = false)
      .select(col("da"), col("db"))
    val freshExact = labelMap(
      Dedup.connectedComponents(emb.select(col("vec_id")), "vec_id", exactPairs),
      "vec_id")
    val servedExact = labelMap(
      DedupQueries.semanticKeepers(spark, Sf0001), "vec_id")
    assert(servedExact === freshExact)
    val ivfPairs = spark.read.parquet(
      DedupQueries.embPairLayout(spark, Sf0001)).select(col("da"), col("db"))
    val freshIvf = labelMap(
      Dedup.connectedComponents(emb.select(col("vec_id")), "vec_id", ivfPairs),
      "vec_id")
    val servedIvf = labelMap(
      DedupQueries.semanticKeepersBucketed(spark, Sf0001), "vec_id")
    assert(servedIvf === freshIvf)
  }

  test("incremental re-propagation: chain growth, component merge, new singleton pair") {
    val spark2 = spark
    import spark2.implicits._
    // prior state: {1,2,3} labeled 1 (chain), {20,21} labeled 20
    val prior = Seq((1L, 1L), (2L, 1L), (3L, 1L), (20L, 20L), (21L, 20L))
      .toDF("doc_id", "component")
    // delta: extend the chain (3-4), merge the two components (2-20),
    // and introduce a brand-new pair (30-31)
    val delta = Seq((3L, 4L), (2L, 20L), (30L, 31L)).toDF("da", "db")
    val got = labelMap(
      Dedup.incrementalComponents(prior, "doc_id", delta), "doc_id")
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      20L -> 1L, 21L -> 1L, 30L -> 30L, 31L -> 30L))
  }

  test("incremental re-propagation equals fresh contraction on a grown pair set") {
    val docs = VectorModel.documents(spark, Sf0001)
    val pairs = spark.read.parquet(DedupQueries.pairLayout(spark, Sf0001))
      .select(col("da"), col("db")).cache()
    // split the pair set by an arbitrary hash: "old" built the prior
    // layout, "new" arrives as the delta
    val isOld = Dedup.hash60(concat_ws(":", col("da"), col("db"))) % 2 === 0
    val oldPairs = pairs.where(isOld)
    val newPairs = pairs.where(!isOld)
    assert(newPairs.count() > 0, "fixture must produce a non-empty delta")
    val prior = Dedup.connectedComponents(docs, "doc_id", oldPairs)
    val inc = Dedup.incrementalComponents(prior, "doc_id", newPairs)
    // merge touched-only incremental labels back over the full corpus —
    // the serving coalesce
    val merged = labelMap(
      docs.select(col("doc_id"))
        .join(inc.withColumnRenamed("component", "c"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("c"), col("doc_id")).as("component")),
      "doc_id")
    val fresh = labelMap(
      Dedup.connectedComponents(docs, "doc_id", pairs), "doc_id")
    assert(merged === fresh,
      "delta re-propagation must reach the same fixed point as a full rebuild")
    pairs.unpersist()
  }

  test("facade tick maintains an attached component layout: propagate, rebuild, no-op") {
    val docs = VectorModel.documents(spark, Sf0001).select("doc_id")
    val pairs = spark.read.parquet(DedupQueries.pairLayout(spark, Sf0001))
      .select(col("da"), col("db")).cache()
    // three arrival waves of the pair layout, batch-partitioned — the
    // growth shape attachComponentState contracts for
    val wave = Dedup.hash60(concat_ws(":", col("da"), col("db"))) % 3
    val base = graft.store.Fs.scratchDir(spark, "component_facade")
    val pairPath = s"$base/pairs"
    val root = s"$base/components"
    pairs.where(wave === 0).withColumn("batch", lit(0))
      .write.partitionBy("batch").mode("overwrite").parquet(pairPath)
    def fresh(upTo: Int): Map[Long, Long] = labelMap(
      Dedup.connectedComponents(docs, "doc_id", pairs.where(wave <= upTo)),
      "doc_id")
    val db = new graft.api.VectorDb(spark, dim = 8)
    db.attachComponentState(docs, "doc_id", pairPath, root)
    // attach publishes v0 = fresh contraction over the current batches
    assert(labelMap(db.componentAssignment(), "doc_id") === fresh(0))
    // nothing grew: the tick is a component no-op
    assert(!db.maintainIndexes().exists(_.startsWith("components")))
    // wave 1 arrives; growth within the delta budget → RE-PROPAGATION,
    // and the published merge must equal a fresh contraction
    pairs.where(wave === 1).withColumn("batch", lit(1))
      .write.partitionBy("batch").mode("append").parquet(pairPath)
    assert(db.maintainIndexes(maxDeltaFraction = 10.0)
      .contains("components_propagated"))
    assert(labelMap(db.componentAssignment(), "doc_id") === fresh(1),
      "propagated assignment must reach the fresh fixed point")
    // wave 2 arrives; a dominating delta → fresh REBUILD, same fixed point
    pairs.where(wave === 2).withColumn("batch", lit(2))
      .write.partitionBy("batch").mode("append").parquet(pairPath)
    assert(db.maintainIndexes(maxDeltaFraction = 1e-9)
      .contains("components_rebuilt"))
    assert(labelMap(db.componentAssignment(), "doc_id") === fresh(2))
    // the runbook surface reports the family with its batch watermark
    val row = db.describeIndexes().where(col("family") === "components")
      .head
    assert(row.getBoolean(1) === true)
    assert(row.getLong(4) === 2L, "covered_up_to must be the batch watermark")
    assert(row.getString(6).startsWith("covered_pairs="))
    // a RE-ATTACH (fresh facade, surviving layout) resumes at the
    // recorded watermark instead of re-contracting
    val db2 = new graft.api.VectorDb(spark, dim = 8)
    db2.attachComponentState(docs, "doc_id", pairPath, root)
    assert(!db2.maintainIndexes().exists(_.startsWith("components")))
    assert(labelMap(db2.componentAssignment(), "doc_id") === fresh(2))
    // a pair layout rebuilt/truncated BELOW the watermark must fail the
    // tick loudly — the assignment was computed from pairs that no
    // longer exist, and a silent no-op would serve it forever
    pairs.where(wave === 0).withColumn("batch", lit(0))
      .write.partitionBy("batch").mode("overwrite").parquet(pairPath)
    val e = intercept[IllegalArgumentException](db2.maintainIndexes())
    assert(e.getMessage.contains("regressed"), e.getMessage)
    pairs.unpersist()
  }

  test("attach before any pair batch lands publishes the all-isolated v0") {
    // legitimate startup order: the facade attaches while the pair writer
    // has not created its layout path yet — v0 is every doc its own
    // component at watermark (-1, 0), and ticks no-op until batch 0 lands
    val docs = VectorModel.documents(spark, Sf0001).select("doc_id").limit(20)
    val base = graft.store.Fs.scratchDir(spark, "component_prebatch")
    val pairPath = s"$base/pairs"
    val root = s"$base/components"
    val db = new graft.api.VectorDb(spark, dim = 8)
    db.attachComponentState(docs, "doc_id", pairPath, root)
    val v0 = labelMap(db.componentAssignment(), "doc_id")
    assert(v0.nonEmpty && v0.forall { case (d, c) => d == c },
      "pre-first-batch v0 must be the all-isolated assignment")
    assert(!db.maintainIndexes().exists(_.startsWith("components")),
      "tick with no pair layout on disk must skip the component pass")
    // batch 0 lands; the next tick folds it as a normal delta from the
    // (-1, 0) watermark and reaches the fresh fixed point
    val ids = docs.orderBy("doc_id").limit(4).collect().map(_.getLong(0))
    val pairs = spark.createDataFrame(Seq(
      (ids(0), ids(1)), (ids(2), ids(3)))).toDF("da", "db")
    pairs.withColumn("batch", lit(0))
      .write.partitionBy("batch").mode("overwrite").parquet(pairPath)
    assert(db.maintainIndexes().exists(_.startsWith("components")))
    val folded = labelMap(db.componentAssignment(), "doc_id")
    val fresh = labelMap(
      Dedup.connectedComponents(docs, "doc_id", pairs), "doc_id")
    assert(folded === fresh)
  }
}
