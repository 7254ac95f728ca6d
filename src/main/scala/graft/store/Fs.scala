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
}
