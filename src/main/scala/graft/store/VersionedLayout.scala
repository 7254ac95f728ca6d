package graft.store

import org.apache.spark.sql.SparkSession

/** Versioned directory layout with commit markers — the pointer-file
  * indirection that makes layout rewrites (compaction, index refit) safe
  * to run NEXT TO serving, closing the gap the plain rename-swap leaves
  * ([[graft.index.Ivf.compactClustered]]'s documented "brief
  * no-layout-at-path window" and its object-store rename caveat).
  *
  * Scheme: `<root>/v<NNNNN>/…` version directories, each committed by an
  * empty marker file created only after its contents are fully written.
  * The live version is simply the HIGHEST committed one — no pointer file
  * to atomically replace (a marker `create` is a single-file PUT, cheaper
  * and safer than directory renames, which S3-class stores emulate as
  * copy+delete). Consequences:
  *
  *  - readers resolve the live dir once per query and keep reading that
  *    snapshot even while a new version publishes — no window, no
  *    partial state, no read-after-overwrite;
  *  - a publish that crashes mid-write leaves an UNCOMMITTED directory
  *    the next publish deletes; the live version is untouched;
  *  - pruning keeps the last [[Keep]] committed versions, so a reader
  *    resolving just before a publish has a full grace version to finish.
  *
  * Contract: ONE writer at a time (maintenance is a scheduled singleton) —
  * and the contract is ENFORCED, not just documented: publish takes a
  * root-level writer lock via create-fail-if-exists, so a second
  * concurrent publish FAILS LOUDLY instead of silently interleaving
  * version numbers with the first (both computing the same `next` and
  * writing into the same directory). The exclusion is only as strong as
  * the filesystem's non-overwrite create: ATOMIC on HDFS and local/POSIX
  * filesystems; BEST-EFFORT on S3-class object stores, where S3A
  * implements overwrite=false as HEAD-then-PUT and two publishes racing
  * within that window can both acquire the lock — real mutual exclusion
  * there needs a store-conditional write (S3 conditional PUT / If-None-
  * Match), which the Hadoop FileSystem API does not expose. This is
  * mutual exclusion for a scheduled singleton, not multi-writer
  * transactions —
  * concurrent writers that should all succeed (conflict detection, retry,
  * snapshot isolation) are a table format's job, out of scope. A publish
  * that dies without releasing the lock (JVM kill between create and the
  * finally) leaves it behind; the next publish names the lock path in its
  * error so the operator's recovery — verify no writer is alive, delete
  * the lock — is one obvious step. Readers need no coordination at all. */
private[graft] object VersionedLayout {

  private val MarkerName = "_graft_committed"

  private val LockName = "_graft_publish_lock"

  /** Committed versions retained after a publish (live + one grace). */
  val Keep = 2

  /** Root resolved AND qualified, so returned version paths carry the
    * filesystem scheme exactly like `listStatus` results do — callers can
    * compare/equate paths from `publish` and `currentDir` directly. */
  private def fsRoot(spark: SparkSession, root: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val (fs, p) = Fs.pathFs(spark, root)
    (fs, fs.makeQualified(p))
  }

  private def versionsOf(fs: org.apache.hadoop.fs.FileSystem,
      rp: org.apache.hadoop.fs.Path): Seq[(Int, org.apache.hadoop.fs.Path, Boolean)] =
    if (!fs.exists(rp)) Seq.empty
    else fs.listStatus(rp).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d{5,}"))
      .map { s =>
        val p = s.getPath
        (p.getName.drop(1).toInt, p,
          fs.exists(new org.apache.hadoop.fs.Path(p, MarkerName)))
      }
      .sortBy(_._1)

  /** The live (highest committed) version directory, if any. */
  def currentDir(spark: SparkSession, root: String): Option[String] = {
    val (fs, rp) = fsRoot(spark, root)
    versionsOf(fs, rp).filter(_._3).lastOption.map(_._2.toString)
  }

  /** All COMMITTED version numbers under `root`, ascending — the
    * time-travel surface's catalog. Uncommitted (torn) directories are
    * invisible here exactly as they are to [[currentDir]]. */
  def committedVersions(spark: SparkSession, root: String): Seq[Int] = {
    val (fs, rp) = fsRoot(spark, root)
    versionsOf(fs, rp).filter(_._3).map(_._1)
  }

  /** Committed version `n`'s directory — None when `n` was never
    * committed, is torn (no marker), or was pruned past [[Keep]]. The
    * AS-OF read primitive: a returned directory is immutable (publishes
    * only ever ADD versions; pruning deletes whole old dirs), so a
    * reader holding it keeps a stable snapshot while later merges land. */
  def versionDir(spark: SparkSession, root: String, n: Int): Option[String] = {
    val (fs, rp) = fsRoot(spark, root)
    versionsOf(fs, rp).find(v => v._1 == n && v._3).map(_._2.toString)
  }

  /** Operator recovery for a lock orphaned by a killed publish (the error
    * message names the holder pid/host/time): removes the writer lock so
    * the next publish can proceed. The caller is asserting no writer is
    * alive — which is why this is a separate explicit call and not a
    * staleness heuristic inside [[publish]]. Returns true if a lock was
    * removed. */
  def forceUnlock(spark: SparkSession, root: String): Boolean = {
    val (fs, rp) = fsRoot(spark, root)
    fs.delete(new org.apache.hadoop.fs.Path(rp, LockName), false)
  }

  /** Write the next version via `write(dir)`, commit it with the marker,
    * prune stale versions. Returns the committed directory. Holds the
    * root's writer lock throughout; a concurrent publish throws
    * [[IllegalStateException]] (see object doc). */
  def publish(spark: SparkSession, root: String)(write: String => Unit): String = {
    val (fs, rp) = fsRoot(spark, root)
    fs.mkdirs(rp)
    val lock = new org.apache.hadoop.fs.Path(rp, LockName)
    // owner evidence INSIDE the lock, so the operator deciding whether a
    // holder is alive (the one manual step a kill-9'd publish leaves — an
    // automatic staleness bound would break a legitimately long write)
    // sees who took it and when. Built BEFORE the create, and written
    // under a separate failure domain: only the CREATE failing means
    // contention — a failed evidence write (disk full, host resolution)
    // must release the lock we just took and report itself, not masquerade
    // as a concurrent writer and wedge the root.
    val evidence =
      s"pid=${ProcessHandle.current().pid()}\n" +
        s"host=${try java.net.InetAddress.getLocalHost.getHostName
          catch { case _: java.io.IOException => "<unknown>" }}\n" +
        s"epochMs=${System.currentTimeMillis()}\n"
    val out = try fs.create(lock, /* overwrite = */ false)
    catch {
      case e: java.io.IOException =>
        val holder = try {
          val in = fs.open(lock)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.replace("\n", " ")
          finally in.close()
        } catch { case _: Throwable => "<unreadable>" }
        throw new IllegalStateException(
          s"concurrent publish under $root: writer lock $lock already exists " +
            s"(holder: $holder) — another publish is in flight, or a previous " +
            "one died holding it (verify that process is gone, then use " +
            "VersionedLayout.forceUnlock to recover)", e)
    }
    try { out.write(evidence.getBytes("UTF-8")); out.close() }
    catch {
      case e: Throwable =>
        try out.close() catch { case _: Throwable => () }
        fs.delete(lock, false)
        throw e
    }
    try {
      val existing = versionsOf(fs, rp)
      // drop uncommitted leftovers (a crashed publish) before numbering
      existing.filterNot(_._3).foreach { case (_, p, _) => fs.delete(p, true) }
      val next = existing.lastOption.map(_._1 + 1).getOrElse(0)
      val dir = new org.apache.hadoop.fs.Path(rp, f"v$next%05d")
      write(dir.toString)
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, MarkerName), true)
      out.close()
      // prune: keep the newest `Keep` committed versions (live + grace)
      val committed = versionsOf(fs, rp).filter(_._3)
      committed.dropRight(Keep).foreach { case (_, p, _) => fs.delete(p, true) }
      dir.toString
    } finally {
      fs.delete(lock, false)
      ()
    }
  }
}
