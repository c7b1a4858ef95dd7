package graft.util

import java.nio.file.attribute.PosixFilePermission
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem whose chmod is a Java NIO call instead of a forked
  * `chmod` subprocess.
  *
  * Without libhadoop.so (absent here — stock Spark jars only),
  * `RawLocalFileSystem.setPermission` falls back to
  * `Shell.execCommand("chmod ...")`: a fork+exec of the multi-GB JVM
  * per call, measured at ~37 ms each on this host. Structured
  * Streaming's checkpoint WAL does several such creates per
  * micro-batch, so small-batch streaming paid ~100 ms/batch of pure
  * process-spawn overhead (~3× the actual model-update work in the
  * G-Stream throughput bench). `Files.setPosixFilePermissions` is the
  * same chmod(2) syscall without the fork.
  *
  * Registered via `spark.hadoop.fs.file.impl` (see [[GraftSession]]);
  * extends the checksummed [[LocalFileSystem]] exactly like the stock
  * `file://` implementation, with only the raw layer swapped.
  */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)

/** The `FileContext` (AbstractFileSystem) twin of
  * [[NioLocalFileSystem]] — Structured Streaming's checkpoint file
  * manager prefers the FileContext API when the scheme supports it, so
  * the WAL create/rename path resolves `fs.AbstractFileSystem.file.impl`
  * rather than `fs.file.impl`. Mirrors Hadoop's own
  * `LocalFs = ChecksumFs(RawLocalFs)` structure with the raw layer
  * swapped for the fork-free one. Instantiated reflectively by Hadoop
  * via the (URI, Configuration) constructor. */
class NioLocalFs(uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.hadoop.fs.ChecksumFs(new NioRawLocalFs(uri, conf))

class NioRawLocalFs(uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new NioRawLocalFileSystem, conf, "file", false)

/** Session-builder tuning shared by every entry point (Bench, Verify,
  * the run harnesses, tests): swap the local filesystems for the
  * fork-free ones (pure performance — semantics identical to stock),
  * and fix the bucketed-scan planning conf once at construction so no
  * query flips it mid-session (planning must not depend on execution
  * order). `outputOrdering=true` lets a one-file-per-bucket scan report
  * its in-bucket sort, so co-located merge joins plan with neither
  * Exchange nor Sort (the q30/q31 plan gates); it is only *used* when a
  * bucketed table is read, and is safe (ignored) otherwise. */
object GraftSession {
  def tuned(b: org.apache.spark.sql.SparkSession.Builder): org.apache.spark.sql.SparkSession.Builder =
    b.config("spark.hadoop.fs.file.impl", classOf[NioLocalFileSystem].getName)
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl", classOf[NioLocalFs].getName)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
}

class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits = permission.toShort.toInt
    val perms = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    val order = Seq(
      PosixFilePermission.OWNER_READ, PosixFilePermission.OWNER_WRITE, PosixFilePermission.OWNER_EXECUTE,
      PosixFilePermission.GROUP_READ, PosixFilePermission.GROUP_WRITE, PosixFilePermission.GROUP_EXECUTE,
      PosixFilePermission.OTHERS_READ, PosixFilePermission.OTHERS_WRITE, PosixFilePermission.OTHERS_EXECUTE)
    order.zipWithIndex.foreach { case (perm, i) =>
      if ((bits & (1 << (8 - i))) != 0) perms.add(perm)
    }
    try java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
    catch {
      // non-POSIX stores or races fall back to Hadoop's own path
      case _: UnsupportedOperationException | _: java.io.IOException =>
        super.setPermission(p, permission)
    }
  }

  /** The second fork site: without native IO,
    * `deprecatedGetFileLinkStatusInternal` shells out to `readlink` for
    * EVERY file it is asked about — and `AbstractFileSystem.rename`
    * (the checkpoint WAL's atomic-rename path) asks about both ends of
    * every rename. A Java NIO symlink probe answers the common
    * not-a-symlink case without the fork; true symlinks (never created
    * by Spark checkpoints) still take Hadoop's original path. */
  override def getFileLinkStatus(f: Path): org.apache.hadoop.fs.FileStatus = {
    val nio = pathToFile(f).toPath
    if (java.nio.file.Files.isSymbolicLink(nio)) super.getFileLinkStatus(f)
    else getFileStatus(f)
  }
}
