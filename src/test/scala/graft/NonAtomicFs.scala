package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test-only Hadoop FileSystem with OBJECT-STORE rename semantics: the
  * `nonatomic://` scheme maps onto the local disk but degrades every
  * `rename` to copy-then-delete with an injectable crash point — the
  * S3-class behavior all the engine's commit-marker protocols exist for,
  * but which every POSIX-backed spec could only simulate by hand
  * (deleting markers after the fact). Registering
  * `fs.nonatomic.impl = graft.NonAtomicFs` in the Hadoop conf routes any
  * `nonatomic:` path here, driver AND executor side (local mode shares
  * the JVM, so the crash switch below reaches task code).
  *
  * Crash modes (one-shot: the first rename after arming fires it, then
  * the mode resets to none):
  *  - `mid-copy`: half of the source bytes land at the destination, then
  *    the rename dies — the torn-file shape a killed copy leaves on an
  *    object store (no atomicity to fall back on);
  *  - `after-copy`: the destination is complete but the source survives —
  *    the duplicate-visibility window of copy+delete.
  */
class NonAtomicFs extends RawLocalFileSystem {

  override def getScheme: String = "nonatomic"

  override def getUri: java.net.URI = java.net.URI.create("nonatomic:///")

  override def rename(src: Path, dst: Path): Boolean = {
    NonAtomicFs.renames.incrementAndGet()
    val srcFile = pathToFile(src)
    val dstFile = pathToFile(dst)
    if (!srcFile.exists()) return false
    if (dstFile.exists()) return false
    if (srcFile.isDirectory) {
      // directory rename: recursive copy-then-delete (no crash injection
      // below the top level — the writers under test rename files)
      org.apache.hadoop.fs.FileUtil.copy(this, src, this, dst, false, getConf)
      return delete(src, true)
    }
    val mode = NonAtomicFs.crashMode.getAndSet("none") match {
      case "none" => "none"
      case armed => armed
    }
    val bytes = java.nio.file.Files.readAllBytes(srcFile.toPath)
    mode match {
      case "mid-copy" =>
        java.nio.file.Files.createDirectories(dstFile.toPath.getParent)
        java.nio.file.Files.write(dstFile.toPath,
          java.util.Arrays.copyOf(bytes, bytes.length / 2))
        throw new java.io.IOException(
          s"simulated object-store crash mid-rename (copy phase): $src -> $dst")
      case "after-copy" =>
        java.nio.file.Files.createDirectories(dstFile.toPath.getParent)
        java.nio.file.Files.write(dstFile.toPath, bytes)
        throw new java.io.IOException(
          s"simulated object-store crash after copy, before source delete: $src")
      case _ =>
        java.nio.file.Files.createDirectories(dstFile.toPath.getParent)
        java.nio.file.Files.write(dstFile.toPath, bytes)
        java.nio.file.Files.delete(srcFile.toPath)
        true
    }
  }
}

object NonAtomicFs {
  /** "none" | "mid-copy" | "after-copy" — consumed (reset to none) by the
    * first rename after arming. */
  val crashMode = new AtomicReference[String]("none")
  /** Total renames routed through the shim (sanity: the writers under
    * test really do commit via rename). */
  val renames = new AtomicInteger(0)
}
