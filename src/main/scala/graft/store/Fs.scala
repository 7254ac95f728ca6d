package graft.store

import org.apache.spark.sql.SparkSession

/** Shared Hadoop `FileSystem` access for layout and sidecar paths.
  *
  * Every persistence path resolves through the Hadoop API because
  * `java.io.File` silently no-ops on remote filesystems (HDFS/S3:
  * `exists()` false, `delete()` false) — which would resurrect stale
  * index sidecars on load and skip index restoration entirely. One
  * helper, one Hadoop-conf acquisition strategy, no copies to drift.
  */
private[graft] object Fs {

  def pathFs(spark: SparkSession, path: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = pathFs(spark, path)
    fs.exists(p)
  }

  def delete(spark: SparkSession, path: String): Unit = {
    val (fs, p) = pathFs(spark, path)
    fs.delete(p, true)
    ()
  }

  /** Data files under a layout, recursively (underscore/dot-prefixed
    * entries — commit markers, sidecars, CRCs — excluded): the compaction
    * trigger statistic of every file-count-bounded maintenance pass.
    *
    * Hidden-ness is judged on every path component BELOW the layout root,
    * not just the leaf name: a streaming sink's `_spark_metadata/0` log
    * files have plain-digit leaves, so a leaf-only filter would count them
    * as data and inflate the compaction trigger. (Components ABOVE the
    * root stay exempt — a layout legitimately lives under a `_scratch`
    * staging dir.) */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val (fs, p) = pathFs(spark, path)
    val base = fs.makeQualified(p)
    val it = fs.listFiles(base, true)
    var n = 0
    while (it.hasNext) {
      var cur: org.apache.hadoop.fs.Path = it.next().getPath
      var hidden = false
      while (cur != null && cur != base) {
        val name = cur.getName
        if (name.startsWith("_") || name.startsWith(".")) hidden = true
        cur = cur.getParent
      }
      if (!hidden) n += 1
    }
    n
  }

  private val scratchSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** A fresh scratch directory on the CLUSTER-VISIBLE filesystem — the
    * layout/spill location every build-once/serve-many path uses.
    *
    * `java.nio.file.Files.createTempDirectory` would hand back a
    * driver-local path: executors on a real cluster can neither read nor
    * write it, so an index "persisted" there serves only in local mode.
    * Here the base resolves through the Hadoop API against the session's
    * default filesystem (override with `spark.graft.scratch.dir`, e.g. an
    * HDFS/S3A staging area), so the same code path works on a cluster.
    * Uniqueness is per-JVM (session start time + counter) and ENFORCED:
    * `mkdirs` returns true for a pre-existing directory, so a collision
    * (two driver JVMs starting the same millisecond against a shared
    * scratch base) would otherwise be silently absorbed and both sessions
    * would write into the same "owned" dir. An ownership marker created
    * with overwrite=false makes the second claimant fail loudly instead —
    * atomically on HDFS/local filesystems; best-effort on S3-class stores,
    * whose non-overwrite create is HEAD-then-PUT (see the
    * [[VersionedLayout]] lock doc for the full caveat). */
  def scratchDir(spark: SparkSession, prefix: String): String = {
    val base = spark.conf.getOption("spark.graft.scratch.dir")
      .getOrElse("/tmp/graft-scratch")
    val (fs, bp) = pathFs(spark, base)
    val p = new org.apache.hadoop.fs.Path(fs.makeQualified(bp),
      s"$prefix-${spark.sparkContext.startTime}-${scratchSeq.incrementAndGet()}")
    require(fs.mkdirs(p), s"cannot create scratch dir $p")
    try fs.create(new org.apache.hadoop.fs.Path(p, "_graft_scratch_owner"),
      /* overwrite = */ false).close()
    catch {
      case e: java.io.IOException =>
        throw new IllegalStateException(
          s"scratch dir $p is already claimed by another session — " +
            "set spark.graft.scratch.dir to a session-private base", e)
    }
    p.toString
  }

  /** Write a tiny text sidecar (overwrite). ONE shared definition for
    * every marker/state record in the engine, so the charset and write
    * shape cannot drift between writers. */
  def writeSidecar(spark: SparkSession, path: String, content: String): Unit = {
    val (fs, p) = pathFs(spark, path)
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a tiny text sidecar fully, `None` when absent. Trimmed — a
    * trailing newline is part of the write shape, not the record. */
  def readSidecar(spark: SparkSession, path: String): Option[String] = {
    val (fs, p) = pathFs(spark, path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  /** Parse EXACTLY `n` space-separated longs, else `None`. The shared
    * torn-sidecar rule: a crash between a sidecar's create and write
    * leaves an empty or truncated file — anything that does not parse as
    * exactly the expected record reads as NO record, so a truncated "12"
    * prefix of "12 34567" can never parse as a value (every caller then
    * applies its own policy: heal from data, or fail loudly naming the
    * torn publish). */
  def parseLongs(txt: String, n: Int): Option[Seq[Long]] = {
    val parts = txt.split(" ")
    if (parts.length != n) None
    else {
      val longs = parts.flatMap(_.toLongOption)
      if (longs.length == n) Some(longs.toSeq) else None
    }
  }
}
