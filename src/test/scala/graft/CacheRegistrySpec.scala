package graft

import org.apache.spark.storage.StorageLevel

import graft.model.VectorModel
import graft.store.CacheRegistry
import graft.text.Bm25

/** Concurrency-safety of operator-internal caches: the old
  * replace-on-next-call `var`s meant a second invocation unpersisted the
  * first's still-unconsumed cache (silent recompute-from-lineage); the
  * bounded registry gives each in-flight invocation its own slot. */
class CacheRegistrySpec extends SparkSpec {

  test("registry: distinct keys coexist, same key reuses the entry, eviction unpersists eldest") {
    val dfs = (0 to CacheRegistry.MaxEntries + 1).map(i =>
      spark.range(1000 + i).toDF("v"))
    val cached = dfs.map(CacheRegistry.cached)
    cached.foreach(_.count())
    // a semantically-equal frame gets the SAME registered instance back
    val again = CacheRegistry.cached(
      spark.range(1000 + CacheRegistry.MaxEntries + 1).toDF("v"))
    assert(again eq cached.last)
    // LRU: the eldest entries were evicted AND unpersisted; recent survive
    assert(cached.head.storageLevel == StorageLevel.NONE,
      "evicted entry must be unpersisted")
    assert(cached.last.storageLevel != StorageLevel.NONE,
      "live entry must stay cached")
  }

  test("interleaved + concurrent BM25 invocations are both correct and keep both caches live") {
    val docs = VectorModel.documents(spark, Sf0001)
    val seqA = Bm25.topK(docs, Seq("vector", "data"), 5).collect()
    val seqB = Bm25.topK(docs, Seq("spark", "graph"), 5).collect()
    // interleave construct/construct/consume/consume — with the old
    // module-level var, B's construction unpersisted A's cache before A
    // was consumed (correct via lineage recompute, but the cache was gone)
    val a = Bm25.topK(docs, Seq("vector", "data"), 5)
    val b = Bm25.topK(docs, Seq("spark", "graph"), 5)
    assert(a.collect() === seqA)
    assert(b.collect() === seqB)
    // truly concurrent: two threads, both results correct
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new java.util.concurrent.Callable[Array[org.apache.spark.sql.Row]] {
        def call() = Bm25.topK(docs, Seq("vector", "data"), 5).collect()
      })
      val fb = pool.submit(new java.util.concurrent.Callable[Array[org.apache.spark.sql.Row]] {
        def call() = Bm25.topK(docs, Seq("spark", "graph"), 5).collect()
      })
      assert(fa.get() === seqA)
      assert(fb.get() === seqB)
    } finally pool.shutdown()
  }

  test("concurrent connected-components invocations both return correct labelings") {
    import org.apache.spark.sql.functions._
    import graft.dedup.Dedup
    val docs = VectorModel.documents(spark, Sf0001).select(col("doc_id"))
    def pairsOf(shift: Long) = spark.createDataFrame(
      Seq((0L + shift, 1L + shift), (1L + shift, 2L + shift), (10L + shift, 11L + shift)))
      .toDF("da", "db")
    def expected(shift: Long) = Map(
      0L + shift -> (0L + shift), 1L + shift -> (0L + shift), 2L + shift -> (0L + shift),
      10L + shift -> (10L + shift), 11L + shift -> (10L + shift))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futs = Seq(0L, 100L).map { shift =>
        shift -> pool.submit(new java.util.concurrent.Callable[Map[Long, Long]] {
          def call() = Dedup.connectedComponents(docs, "doc_id", pairsOf(shift))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        })
      }
      futs.foreach { case (shift, f) =>
        val got = f.get()
        expected(shift).foreach { case (doc, comp) =>
          assert(got(doc) === comp, s"doc $doc (shift $shift)")
        }
      }
    } finally pool.shutdown()
  }
}
