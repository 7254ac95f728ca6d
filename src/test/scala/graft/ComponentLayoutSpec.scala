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
}
