package graft

import graft.api.VectorDb

/** Facade lifecycle of the PCA-reduced index ([[graft.api.VectorDb]]
  * buildPcaIndex/pcaSearch/maintainIndexes/describeIndexes) — the
  * [[BinFacadeSpec]] contract applied to the subspace codec: clean-index
  * exactness at full rerank, the delta/mutation merge contracts, the
  * maintenance tick, and the dim-scaled component count. */
class PcaFacadeSpec extends SparkSpec {

  private def freshDb(n: Int = 120, dim: Int = 8): VectorDb = {
    val rng = new java.util.Random(29)
    val db = new VectorDb(spark, dim)
    db.batchInsert((0 until n).map { i =>
      (Seq.fill(dim)(rng.nextDouble() * 2 - 1), Map("i" -> i.toString))
    })
    db
  }

  private val q = Seq(0.9, -0.3, 0.5, 0.1, -0.7, 0.2, 0.4, -0.1)

  test("with rerank covering the corpus, pcaSearch equals brute force exactly") {
    val db = freshDb()
    db.buildPcaIndex()
    val exact = db.bruteForceSearch(q, 5).select("id", "sim")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val got = db.pcaSearch(q, 5, rerank = 200).select("id", "sim")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == exact.toSeq)
  }

  test("pcaSearch requires a built index, like ivfSearch") {
    val db = freshDb(10)
    val e = intercept[IllegalStateException] { db.pcaSearch(q) }
    assert(e.getMessage.contains("not built"))
  }

  test("inserts after the build serve exactly from the delta region") {
    val db = freshDb()
    db.buildPcaIndex()
    val id = db.insert(q) // a perfect match the projections have never seen
    val top = db.pcaSearch(q, 1, rerank = 200).collect()(0)
    assert(top.getLong(0) == id)
    assert(top.getDouble(1) == 1.0)
  }

  test("deletes drop out and updates re-score through the live join") {
    val db = freshDb()
    db.buildPcaIndex()
    val before = db.pcaSearch(q, 2, rerank = 200).collect().map(_.getLong(0))
    db.delete(before(0))
    val after = db.pcaSearch(q, 2, rerank = 200).collect().map(_.getLong(0))
    assert(!after.contains(before(0)))
    assert(after(0) == before(1))
  }

  test("maintainIndexes rebuilds on mutation, drops on empty, then clean") {
    val db = freshDb()
    db.buildPcaIndex()
    assert(!db.maintainIndexes().contains("pca_rebuilt"))
    db.delete(0L)
    assert(db.maintainIndexes().contains("pca_rebuilt"))
    assert(!db.maintainIndexes().contains("pca_rebuilt"))
    val exact = db.bruteForceSearch(q, 5).collect().map(_.getLong(0)).toSeq
    assert(db.pcaSearch(q, 5, rerank = 200).collect().map(_.getLong(0)).toSeq == exact)
    val tiny = freshDb(5)
    tiny.buildPcaIndex()
    (0L until 5L).foreach(tiny.delete)
    assert(tiny.maintainIndexes().contains("pca_dropped"))
    intercept[IllegalStateException] { tiny.pcaSearch(q) }
  }

  test("describeIndexes reflects build state and the dim-scaled r") {
    val db = freshDb(20)
    def pcaRow = db.describeIndexes().collect()
      .find(_.getString(0) == "pca").get
    assert(!pcaRow.getBoolean(1))
    db.buildPcaIndex()
    val built = pcaRow
    assert(built.getBoolean(1) && !built.getBoolean(3))
    assert(built.getLong(4) == 20L && built.getLong(5) >= 1L)
    assert(built.getString(6) == "r=2", s"dim 8 -> r=2, got ${built.getString(6)}")
    db.delete(3L)
    assert(pcaRow.getBoolean(3), "mutation must surface in the report")
    db.maintainIndexes()
    assert(!pcaRow.getBoolean(3))
  }
}
