package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.store.VectorStore

/** CRUD invariants (W1–W4, W10–W11; reference vervectordb/__init__.py:
  * 243-335, 556-594). */
class CrudSpec extends SparkSpec {

  lazy val data = VectorModel.lineitemVectors(spark, Sf0001).cache()

  private def newRow(id: Long, d: Int) = {
    spark.range(1).select(
      lit(id).as("id"),
      array((0 until d).map(i => lit(i + 1.0)): _*).as("vector"),
      lit("Z").as("category"), lit("Z").as("status"))
  }

  test("insert appends exactly one row and it is retrievable") {
    val n0 = data.count()
    val out = VectorStore.insert(data, newRow(-42L, 8), VectorModel.Dim)
    assert(out.count() === n0 + 1)
    assert(out.where(col("id") === -42L).count() === 1)
  }

  test("insert rejects wrong-dimension vectors (reference :243-245)") {
    val bad = VectorStore.insert(data, newRow(-43L, 5), VectorModel.Dim)
    val e = intercept[Exception] { bad.where(col("id") === -43L).collect() }
    assert(e.getMessage.toLowerCase.contains("dimension mismatch"))
  }

  test("delete removes exactly the matching rows; ids stay unique") {
    val n0 = data.count()
    val nR = data.where(col("category") === "R").count()
    val out = VectorStore.delete(data, col("category") === "R")
    assert(out.count() === n0 - nR)
    assert(out.where(col("category") === "R").count() === 0)
    assert(out.select("id").distinct().count() === out.count())
  }

  test("update replaces values without changing count") {
    val n0 = data.count()
    val out = VectorStore.update(data, col("status") === "O",
      Map("category" -> lit("X")))
    assert(out.count() === n0)
    assert(out.where(col("status") === "O" && col("category") =!= "X").count() === 0)
    assert(out.where(col("status") =!= "O" && col("category") === "X").count() === 0)
  }

  test("save/load roundtrip preserves content (W10/W11)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_store").toString
    val subset = data.limit(100)
    VectorStore.save(subset, s"$dir/t")
    val back = VectorStore.load(spark, s"$dir/t")
    assert(back.count() === 100)
    assert(back.columns.sorted.toSeq === subset.columns.sorted.toSeq)
    val origSum = subset.agg(sum("id")).collect()(0).getLong(0)
    assert(back.agg(sum("id")).collect()(0).getLong(0) === origSum)
  }

  test("json and csv formats roundtrip (csv without array columns)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val subset = data.limit(50).cache()
    val origSum = subset.agg(sum("id")).collect()(0).getLong(0)
    VectorStore.save(subset, s"$dir/j", format = "json")
    val j = VectorStore.load(spark, s"$dir/j", "json", Some(subset.schema))
    assert(j.count() === 50)
    assert(j.agg(sum("id")).collect()(0).getLong(0) === origSum)
    assert(j.select(size(col("vector"))).distinct().collect()(0).getInt(0) === 8)
    val flat = subset.select("id", "category", "status")
    VectorStore.save(flat, s"$dir/c", format = "csv")
    val c = VectorStore.load(spark, s"$dir/c", "csv", Some(flat.schema))
    assert(c.count() === 50)
    assert(c.agg(sum("id")).collect()(0).getLong(0) === origSum)
  }

  test("salted aggregation equals the direct aggregation (skew path)") {
    import graft.operators.Skew
    val cents = round(element_at(col("vector"), 2) * 100.0).cast("long")
    val direct = data.groupBy("category")
      .agg(sum(cents).as("sum"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val salted = Skew.saltedSumCount(data, "category", cents, 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(salted === direct)
  }

  // ---- keyed bulk MERGE ------------------------------------------------

  private def deltaRow(id: Long, v0: Double, cat: String, op: String) =
    spark.range(1).select(lit(id).as("id"),
      array(lit(v0) +: (1 until VectorModel.Dim).map(i => lit(i * 1.0)): _*)
        .as("vector"),
      lit(cat).as("category"), lit("Z").as("status"), lit(op).as("op"))

  test("merge: upsert updates present ids, inserts absent, delete removes") {
    val base = data.limit(0) // schema only
      .unionByName(Seq(10L, 11L, 12L).map(i =>
        newRow(i, 8).withColumn("category", lit("A"))).reduce(_ unionByName _))
    val delta = deltaRow(11L, 5.0, "U1", "U") // update
      .unionByName(deltaRow(99L, 6.0, "NEW", "U")) // insert
      .unionByName(deltaRow(12L, 0.0, "-", "D")) // delete
    val out = VectorStore.merge(base, delta).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out === Map(10L -> "A", 11L -> "U1", 99L -> "NEW"))
  }

  test("merge: unknown op fails loudly") {
    val e = intercept[Exception] {
      VectorStore.merge(data.limit(3), deltaRow(1L, 1.0, "X", "Q")).collect()
    }
    assert(e.getMessage.contains("unknown merge op"))
  }

  test("merge: a non-deterministic delta is evaluated exactly once") {
    import org.apache.spark.sql.functions._
    // an accumulator counts SOURCE evaluations through a non-deterministic
    // udf; without the checkpoint the validation scan + both merge
    // branches would each re-evaluate the delta (3x rows), and the
    // branches could observe DIFFERENT rows
    val evals = spark.sparkContext.longAccumulator("delta_evals")
    val counting = udf { (id: Long) => { evals.add(1L); id } }.asNondeterministic()
    val base = data.limit(0).unionByName(
      Seq(10L, 11L).map(i => newRow(i, 8).withColumn("category", lit("A")))
        .reduce(_ unionByName _))
    val delta = deltaRow(11L, 5.0, "U1", "U")
      .unionByName(deltaRow(99L, 6.0, "NEW", "U"))
      .withColumn("id", counting(col("id")))
    val out = VectorStore.merge(base, delta).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out === Map(10L -> "A", 11L -> "U1", 99L -> "NEW"))
    assert(evals.value === 2L,
      s"non-deterministic delta evaluated ${evals.value} row-evals for 2 rows" +
        " — must be checkpointed to exactly one evaluation")
    // the replay-stable shape skips the checkpoint (the r16 cost
    // attribution): its validated frame keeps the original plan
    val det = deltaRow(11L, 5.0, "U1", "U")
    val validated = VectorStore.validatedDelta(det, "op")
    assert(validated.queryExecution.analyzed === det.queryExecution.analyzed,
      "a replay-stable delta must pass through un-checkpointed")
    // Expression.deterministic is NOT the test: dropDuplicates picks its
    // survivor by shuffle fetch order while reporting deterministic —
    // the whitelist must checkpoint it (and any aggregate/limit/join)
    Seq(
      det.dropDuplicates("id"),
      det.limit(1),
      det.groupBy("id").agg(org.apache.spark.sql.functions.first("op").as("op"))
        .join(det.drop("op"), "id")
    ).foreach { orderSensitive =>
      val v = VectorStore.validatedDelta(
        orderSensitive.withColumn("op", lit("U")), "op")
      assert(v.queryExecution.analyzed !==
        orderSensitive.withColumn("op", lit("U")).queryExecution.analyzed,
        s"order-sensitive plan must be checkpointed: ${orderSensitive.queryExecution.analyzed.nodeName}")
    }
  }

  test("replayStable: RDD-backed and memory-only-cached leaves are NOT stable") {
    import org.apache.spark.sql.functions._
    val det = deltaRow(11L, 5.0, "U1", "U")
    // createDataFrame(rdd): arbitrary RDD lineage with no determinism
    // metadata in the plan — must checkpoint (the r16 whitelist accepted
    // every LogicalRDD and reopened the replay divergence for these)
    val rddBacked = spark.createDataFrame(det.rdd, det.schema)
    assert(!VectorStore.replayStable(rddBacked.queryExecution.analyzed),
      "un-checkpointed RDD lineage must not count as replay-stable")
    val v = VectorStore.validatedDelta(rddBacked, "op")
    assert(v.queryExecution.analyzed !== rddBacked.queryExecution.analyzed,
      "an RDD-backed delta must be checkpointed")
    // a checkpointed delta (exactly what validatedDelta produces) IS
    // stable — callers pre-checkpointing don't pay twice
    assert(VectorStore.replayStable(v.queryExecution.analyzed),
      "a checkpointed delta must pass through un-checkpointed")
    // cache substitution: a MEMORY_ONLY cache over a nondeterministic
    // child recomputes that child on block eviction — not stable; the
    // same cache disk-backed (or over a stable child) is
    // fresh frame per case: withCachedData is a lazy val on the frame's
    // QueryExecution, so a re-persisted SAME frame would replay the first
    // substitution
    val memOnly = det.withColumn("salt", rand())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    memOnly.count()
    assert(!VectorStore.replayStable(memOnly.queryExecution.withCachedData),
      "MEMORY_ONLY cache over a nondeterministic child must not be stable")
    memOnly.unpersist(blocking = true)
    val onDisk = det.withColumn("salt", rand())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onDisk.count()
    assert(VectorStore.replayStable(onDisk.queryExecution.withCachedData),
      "a disk-backed cache survives eviction — stable")
    onDisk.unpersist(blocking = true)
    val stableChild = det.withColumn("salt", lit(0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    stableChild.count()
    assert(VectorStore.replayStable(stableChild.queryExecution.withCachedData),
      "MEMORY_ONLY over a replay-stable child recomputes to the same rows — stable")
    stableChild.unpersist(blocking = true)
  }

  test("mergeVersioned: bootstrap on an empty root validates ops too") {
    val root = s"/tmp/graft_mergeboot_${java.util.UUID.randomUUID()}"
    try {
      val e = intercept[Exception] {
        VectorStore.mergeVersioned(spark, root, deltaRow(1L, 1.0, "A", "UPSERT"))
      }
      assert(e.getMessage.contains("unknown merge op"),
        s"bootstrap must fail loudly on unknown ops, got: ${e.getMessage}")
      assert(graft.store.VersionedLayout.currentDir(spark, root).isEmpty,
        "no version may commit from a delta with invalid ops")
    } finally graft.store.Fs.delete(spark, root)
  }

  test("mergeVersioned: commit-marker landing, crash leaves no torn version") {
    import graft.store.VersionedLayout
    val root = s"/tmp/graft_merge_${java.util.UUID.randomUUID()}"
    try {
      // bootstrap: first merge on an empty root takes the delta's U-rows
      val v0 = VectorStore.mergeVersioned(spark, root,
        deltaRow(1L, 1.0, "A", "U").unionByName(deltaRow(2L, 2.0, "B", "U")))
      assert(VersionedLayout.currentDir(spark, root) === Some(v0))
      // crashed publish: the write throws AFTER producing files — the root
      // must keep serving v0, with no marker on the torn dir
      intercept[Exception] {
        VectorStore.mergeVersioned(spark, root, deltaRow(3L, 3.0, "C", "Q"))
      }
      assert(VersionedLayout.currentDir(spark, root) === Some(v0),
        "a torn merge version became visible")
      val before = spark.read.parquet(v0).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(before === Map(1L -> "A", 2L -> "B"))
      // recovery: the next good merge publishes over the torn leftovers
      val v1 = VectorStore.mergeVersioned(spark, root,
        deltaRow(2L, 9.0, "B2", "U").unionByName(deltaRow(1L, 0.0, "-", "D")))
      assert(v1 !== v0)
      assert(VersionedLayout.currentDir(spark, root) === Some(v1))
      val after = spark.read.parquet(v1).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(after === Map(2L -> "B2"))
    } finally graft.store.Fs.delete(spark, root)
  }

  test("readVersion: pinned snapshot stable under later merges; torn and pruned versions fail loudly") {
    import graft.store.VersionedLayout
    val root = s"/tmp/graft_asof_${java.util.UUID.randomUUID()}"
    def cats(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    try {
      // v0 bootstrap, v1 a keyed merge
      VectorStore.mergeVersioned(spark, root,
        deltaRow(1L, 1.0, "A", "U").unionByName(deltaRow(2L, 2.0, "B", "U")))
      VectorStore.mergeVersioned(spark, root,
        deltaRow(2L, 9.0, "B2", "U").unionByName(deltaRow(3L, 3.0, "C", "U")))
      assert(VectorStore.versions(spark, root) === Seq(0, 1))
      val v1Before = cats(VectorStore.readVersion(spark, root, 1))
      assert(v1Before === Map(1L -> "A", 2L -> "B2", 3L -> "C"))
      // a TORN later publish (crashes after writing files, before the
      // marker) is invisible to the catalog and unreadable as a version
      intercept[Exception] {
        VectorStore.mergeVersioned(spark, root, deltaRow(4L, 4.0, "D", "Q"))
      }
      assert(VectorStore.versions(spark, root) === Seq(0, 1))
      val eTorn = intercept[IllegalArgumentException] {
        VectorStore.readVersion(spark, root, 2)
      }
      assert(eTorn.getMessage.contains("no committed version 2"))
      // merge v2 lands: the pinned v1 read is BYTE-STABLE while the live
      // version moved on, and retention (Keep = 2) prunes v0
      VectorStore.mergeVersioned(spark, root, deltaRow(1L, 0.0, "-", "D"))
      assert(VectorStore.versions(spark, root) === Seq(1, 2))
      assert(cats(VectorStore.readVersion(spark, root, 1)) === v1Before,
        "the pinned historical read changed under a later merge")
      assert(cats(VectorStore.readVersion(spark, root, 2)) ===
        Map(2L -> "B2", 3L -> "C"))
      assert(VersionedLayout.currentDir(spark, root) ===
        VersionedLayout.versionDir(spark, root, 2))
      // the pruned v0 names what IS still available in its error
      val ePruned = intercept[IllegalArgumentException] {
        VectorStore.readVersion(spark, root, 0)
      }
      assert(ePruned.getMessage.contains("no committed version 0"))
      assert(ePruned.getMessage.contains("1, 2"))
    } finally graft.store.Fs.delete(spark, root)
  }
}
