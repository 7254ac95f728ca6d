package graft

import org.apache.spark.sql.functions._

import graft.model.VectorModel
import graft.operators.TokenShards
import graft.sources.WarcSource

/** The engine's publish protocols under TRUE S3-class rename semantics.
  * Every torn-publish spec elsewhere runs on a POSIX filesystem where
  * rename IS atomic, so the object-store failure shapes are simulated by
  * hand (markers deleted after the fact). Here the [[NonAtomicFs]] shim
  * makes rename genuinely copy-then-delete with an injectable crash
  * point, and the same writer contracts must hold:
  *
  *  - a clean publish (parts renamed member-by-member, then the driver
  *    marker) serves identically to the POSIX path;
  *  - a crash MID-RENAME — the failure POSIX cannot produce — leaves a
  *    partial file set with no marker, which every reader rejects
  *    loudly by naming the marker;
  *  - a clean rewrite over the crashed layout recovers (and, in one
  *    JVM, the point-read memo serves the rewritten shape — the
  *    committedMemo invalidation under its real failure mode);
  *  - [[graft.store.VersionedLayout]] needs no rename at all (marker
  *    indirection instead of dir swaps) and behaves identically here.
  */
class ObjectStoreSpec extends SparkSpec {

  private val Cap = 32

  /** nonatomic:-schemed scratch root; registering the shim is idempotent. */
  private def objRoot(tag: String): String = {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.nonatomic.impl", classOf[NonAtomicFs].getName)
    "nonatomic:" + java.nio.file.Files.createTempDirectory(s"graft_obj_$tag")
  }

  private def docs = VectorModel.documents(spark, Sf0001)
    .select("doc_id", "text").orderBy("doc_id").limit(24)

  private def rootCause(e: Throwable): String = {
    var c: Throwable = e
    val sb = new StringBuilder(e.toString)
    while (c.getCause != null) { c = c.getCause; sb.append(" <- ").append(c.toString) }
    sb.toString
  }

  test("token shards commit via real copy-then-delete; torn publish still loud") {
    val dir = objRoot("shards") + "/shards"
    val before = NonAtomicFs.renames.get()
    val (_, totalSeqs, _) =
      TokenShards.write(docs, "doc_id", "text", Cap, 8, 2, dir)
    assert(NonAtomicFs.renames.get() > before,
      "the shard writer must be committing through the shim's rename")
    assert(TokenShards.readWindow(spark, dir, 0L).length === Cap)
    assert(TokenShards.readWindow(spark, dir, totalSeqs - 1).length === Cap)
    assert(TokenShards.readAggregates(spark, dir, Cap).count() > 0)
    // the hand-simulated torn publish, now on a store where it is real
    val (fs, p) = graft.store.Fs.pathFs(spark, dir)
    fs.delete(new org.apache.hadoop.fs.Path(p, "_graft_shards_committed"), false)
    val e = intercept[IllegalArgumentException](
      TokenShards.readAggregates(spark, dir, Cap).count())
    assert(e.getMessage.contains("_graft_shards_committed"), e.getMessage)
  }

  test("crash mid-rename: partial unpublished layout rejected; clean rewrite recovers") {
    val dir = objRoot("shardscrash") + "/shards"
    NonAtomicFs.crashMode.set("mid-copy")
    try {
      val e = intercept[Throwable](
        TokenShards.write(docs, "doc_id", "text", Cap, 8, 2, dir))
      assert(rootCause(e).contains("simulated object-store crash"), rootCause(e))
    } finally NonAtomicFs.crashMode.set("none")
    val (fs, p) = graft.store.Fs.pathFs(spark, dir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p, "_graft_shards_committed")),
      "a crashed job must never look published")
    val eRead = intercept[IllegalArgumentException](
      TokenShards.readWindow(spark, dir, 0L))
    assert(eRead.getMessage.contains("_graft_shards_committed"), eRead.getMessage)
    // recovery: rewrite the SAME path cleanly; reads — including the
    // memoized point-read path in this same JVM — serve the new layout
    val (_, totalSeqs, _) =
      TokenShards.write(docs, "doc_id", "text", Cap, 8, 2, dir)
    assert(TokenShards.readWindow(spark, dir, totalSeqs - 1).length === Cap)
    assert(TokenShards.readAggregates(spark, dir, Cap).count() > 0)
  }

  test("warc gz egress: clean publish round-trips; crash-after-copy leaves it unpublished") {
    val dir = objRoot("warc") + "/crawl"
    val fullDocs = VectorModel.documents(spark, Sf0001)
      .orderBy("doc_id").limit(24)
      .select("doc_id", "text", "lang", "source")
    WarcSource.writeGz(fullDocs, dir)
    val back = WarcSource.readDocuments(spark, dir)
    assert(back.count() === docs.count())
    // point fetch resolves through the parquet cdx index written (and
    // committed by Spark's own committer) under the same semantics
    val want = docs.collect()(3).getLong(0)
    val got = WarcSource.fetchDocumentsById(spark, dir, Seq(want)).collect()
    assert(got.length === 1 && got(0).getLong(0) === want)

    // the duplicate-visibility crash: destination complete, source left
    val dir2 = objRoot("warccrash") + "/crawl"
    NonAtomicFs.crashMode.set("after-copy")
    try {
      val e = intercept[Throwable](WarcSource.writeGz(fullDocs, dir2))
      assert(rootCause(e).contains("simulated object-store crash"), rootCause(e))
    } finally NonAtomicFs.crashMode.set("none")
    val eRead = intercept[IllegalArgumentException](
      WarcSource.readDocuments(spark, dir2).count())
    assert(eRead.getMessage.contains("_graft_warc_committed"), eRead.getMessage)
  }

  test("versioned layout is rename-free by design and identical under the shim") {
    val root = objRoot("versioned") + "/layout"
    val before = NonAtomicFs.renames.get()
    val v0 = graft.store.VersionedLayout.publish(spark, root) { d =>
      graft.store.Fs.writeSidecar(spark, s"$d/payload", "v0\n")
    }
    assert(graft.store.VersionedLayout.currentDir(spark, root) === Some(v0))
    // a publish that dies mid-write stays invisible; the live version
    // survives and the next publish supersedes the torn dir
    intercept[RuntimeException] {
      graft.store.VersionedLayout.publish(spark, root) { d =>
        graft.store.Fs.writeSidecar(spark, s"$d/payload", "torn\n")
        throw new RuntimeException("killed mid-publish")
      }
    }
    assert(graft.store.VersionedLayout.currentDir(spark, root) === Some(v0))
    val v2 = graft.store.VersionedLayout.publish(spark, root) { d =>
      graft.store.Fs.writeSidecar(spark, s"$d/payload", "v2\n")
    }
    assert(graft.store.VersionedLayout.currentDir(spark, root) === Some(v2))
    assert(graft.store.Fs.readSidecar(spark, s"$v2/payload").map(_.trim) ===
      Some("v2"))
    assert(NonAtomicFs.renames.get() === before,
      "the versioned publish protocol must not rename at all — that is " +
        "exactly what makes it object-store safe")
  }
}
