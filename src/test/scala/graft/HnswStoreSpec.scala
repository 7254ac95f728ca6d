package graft

import graft.index.{Hnsw, HnswStore}
import graft.model.VectorModel

/** Guards on the persisted-HNSW layout: serving must stay CORRECT under any
  * file-split configuration (the complete-graph invariant either holds or
  * the grouping-shuffle fallback engages — never silent partial graphs),
  * and the hyperparameter sidecar must round-trip so build-time parameters
  * govern serving regardless of caller defaults. */
class HnswStoreSpec extends SparkSpec {

  private def topKPairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("stored serving equals fresh build when files would split (shuffle fallback, not partial graphs)") {
    val vecs = VectorModel.lineitemVectors(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_hnsw_split").toString
    HnswStore.save(vecs, s"$dir/g", numPartitions = 4)
    val fresh = topKPairs(Hnsw.hnswTopK(vecs, VectorModel.Query, 10, numPartitions = 4))
    val savedMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val savedOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    try {
      // force every stored file above the computed split size: the unsplit
      // precondition fails and serving must take the grouping shuffle
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
      spark.conf.set("spark.sql.files.openCostInBytes", "16")
      val stored = topKPairs(HnswStore.topK(spark, s"$dir/g", VectorModel.Query, 10))
      assert(stored === fresh)
      assert(stored.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", savedMax)
      spark.conf.set("spark.sql.files.openCostInBytes", savedOpen)
    }
  }

  test("hyperparameter sidecar round-trips and governs serving over caller defaults") {
    val vecs = VectorModel.lineitemVectors(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_hnsw_meta").toString
    HnswStore.save(vecs, s"$dir/g", m = 24, efConstruction = 120, numPartitions = 4)
    assert(HnswStore.readMeta(spark, s"$dir/g") === Some((24, 120, 4)))
    // caller passes wildly wrong fallback params; stored meta must win
    val stored = topKPairs(HnswStore.topK(spark, s"$dir/g", VectorModel.Query, 10,
      m = 2, efConstruction = 4))
    val fresh = topKPairs(Hnsw.hnswTopK(vecs, VectorModel.Query, 10,
      m = 24, efConstruction = 120, numPartitions = 4))
    assert(stored === fresh)
  }
}
