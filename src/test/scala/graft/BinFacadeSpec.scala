package graft

import graft.api.VectorDb

/** Facade lifecycle of the 1-bit code index ([[graft.api.VectorDb]]
  * buildBinIndex/binSearch/maintainIndexes/describeIndexes): clean-index
  * exactness at full rerank, the delta/mutation merge contracts, and the
  * maintenance tick. */
class BinFacadeSpec extends SparkSpec {

  private def freshDb(n: Int = 120, dim: Int = 8): VectorDb = {
    val rng = new java.util.Random(23)
    val db = new VectorDb(spark, dim)
    db.batchInsert((0 until n).map { i =>
      (Seq.fill(dim)(rng.nextDouble() * 2 - 1), Map("i" -> i.toString))
    })
    db
  }

  private val q = Seq(0.9, -0.3, 0.5, 0.1, -0.7, 0.2, 0.4, -0.1)

  test("with rerank covering the corpus, binSearch equals brute force exactly") {
    val db = freshDb()
    db.buildBinIndex()
    val exact = db.bruteForceSearch(q, 5).select("id", "sim")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val got = db.binSearch(q, 5, rerank = 200).select("id", "sim")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == exact.toSeq)
  }

  test("binSearch requires a built index, like ivfSearch") {
    val db = freshDb(10)
    val e = intercept[IllegalStateException] { db.binSearch(q) }
    assert(e.getMessage.contains("not built"))
  }

  test("inserts after the build serve exactly from the delta region") {
    val db = freshDb()
    db.buildBinIndex()
    val id = db.insert(q) // a perfect match the codes have never seen
    val top = db.binSearch(q, 1, rerank = 200).collect()(0)
    assert(top.getLong(0) == id)
    assert(top.getDouble(1) == 1.0)
  }

  test("deletes drop out and updates re-score through the live join") {
    val db = freshDb()
    db.buildBinIndex()
    val before = db.binSearch(q, 2, rerank = 200).collect().map(_.getLong(0))
    db.delete(before(0))
    val after = db.binSearch(q, 2, rerank = 200).collect().map(_.getLong(0))
    assert(!after.contains(before(0)))
    assert(after(0) == before(1))
    db.update(after(0), vector = Some(Seq.fill(8)(0.0))) // zero-norm: sim 0
    val re = db.binSearch(q, 1, rerank = 200).collect()(0)
    assert(re.getLong(0) != after(0))
  }

  test("maintainIndexes rebuilds on mutation and is a no-op when clean") {
    val db = freshDb()
    db.buildBinIndex()
    assert(!db.maintainIndexes().contains("bin_rebuilt"))
    db.delete(0L)
    assert(db.maintainIndexes().contains("bin_rebuilt"))
    // post-rebuild: clean again, and the rebuilt codes serve exactly
    assert(!db.maintainIndexes().contains("bin_rebuilt"))
    val exact = db.bruteForceSearch(q, 5).collect().map(_.getLong(0)).toSeq
    assert(db.binSearch(q, 5, rerank = 200).collect().map(_.getLong(0)).toSeq == exact)
  }

  test("maintainIndexes drops the index when every row is deleted") {
    val db = freshDb(5)
    db.buildBinIndex()
    (0L until 5L).foreach(db.delete)
    assert(db.maintainIndexes().contains("bin_dropped"))
    intercept[IllegalStateException] { db.binSearch(q) }
  }

  test("describeIndexes reflects build and mutation state") {
    val db = freshDb(20)
    def binRow = db.describeIndexes().collect()
      .find(_.getString(0) == "bin").get
    assert(!binRow.getBoolean(1))
    db.buildBinIndex()
    val built = binRow
    assert(built.getBoolean(1) && !built.getBoolean(3))
    assert(built.getLong(4) == 20L && built.getLong(5) >= 1L)
    assert(built.getString(6) == "words=1")
    db.delete(3L)
    assert(binRow.getBoolean(3), "mutation must surface in the report")
    db.maintainIndexes()
    assert(!binRow.getBoolean(3))
  }
}
