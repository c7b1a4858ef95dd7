package graft.util

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.PosixFilePermission._
import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSupport

/** The fork-free local filesystem is load-bearing for every checkpoint
  * write: prove the NIO chmod sets the same bits Hadoop's shelled-out
  * chmod would, that symlinks still take the stock path, and that the
  * session actually resolves our implementations for both FileSystem
  * and FileContext access. */
class NioLocalFileSystemSpec extends AnyFunSuite with SparkTestSupport {

  private def tmpFile(): java.nio.file.Path = {
    val f = Files.createTempFile("nio-fs-spec", ".txt")
    Files.writeString(f, "x")
    f
  }

  test("setPermission maps every FsPermission bit to the POSIX set") {
    val raw = new NioRawLocalFileSystem
    raw.initialize(java.net.URI.create("file:///"), new org.apache.hadoop.conf.Configuration())
    for (mode <- Seq(Integer.parseInt("600", 8), Integer.parseInt("644", 8),
        Integer.parseInt("755", 8), Integer.parseInt("731", 8))) {
      val f = tmpFile()
      raw.setPermission(new Path(f.toUri), new FsPermission(mode.toShort))
      val got = Files.getPosixFilePermissions(f)
      val expect = Seq(
        OWNER_READ -> (1 << 8), OWNER_WRITE -> (1 << 7), OWNER_EXECUTE -> (1 << 6),
        GROUP_READ -> (1 << 5), GROUP_WRITE -> (1 << 4), GROUP_EXECUTE -> (1 << 3),
        OTHERS_READ -> (1 << 2), OTHERS_WRITE -> (1 << 1), OTHERS_EXECUTE -> 1)
        .collect { case (p, bit) if (mode & bit) != 0 => p }.toSet
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet === expect, s"mode ${mode.toOctalString}")
      Files.deleteIfExists(f)
    }
  }

  test("getFileLinkStatus: plain files skip the shell; symlinks match stock Hadoop") {
    val raw = new NioRawLocalFileSystem
    raw.initialize(java.net.URI.create("file:///"), new org.apache.hadoop.conf.Configuration())
    val stock = new org.apache.hadoop.fs.RawLocalFileSystem
    stock.initialize(java.net.URI.create("file:///"), new org.apache.hadoop.conf.Configuration())
    val f = tmpFile()
    val st = raw.getFileLinkStatus(new Path(f.toUri))
    assert(!st.isSymlink)
    assert(st.getLen === 1)
    // symlinks take the super (stock) path — the contract is parity
    // with whatever stock Hadoop reports in this environment (without
    // native IO it parses shell output and may not flag the link), NOT
    // a behavior change
    val link = Paths.get(f.toString + ".lnk")
    Files.createSymbolicLink(link, f)
    val ours = raw.getFileLinkStatus(new Path(link.toUri))
    val theirs = stock.getFileLinkStatus(new Path(link.toUri))
    assert(ours.isSymlink === theirs.isSymlink)
    assert(ours.getLen === theirs.getLen)
    Files.deleteIfExists(link); Files.deleteIfExists(f)
  }

  test("the session resolves graft implementations for file:// via both APIs") {
    val conf = spark.sessionState.newHadoopConf()
    val fs = org.apache.hadoop.fs.FileSystem.get(java.net.URI.create("file:///"), conf)
    assert(fs.isInstanceOf[NioLocalFileSystem], s"FileSystem is ${fs.getClass}")
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(java.net.URI.create("file:///"), conf)
    assert(fc.getDefaultFileSystem.isInstanceOf[NioLocalFs],
      s"AbstractFileSystem is ${fc.getDefaultFileSystem.getClass}")
    // end-to-end through the FileContext rename path the checkpoint
    // WAL uses: create + atomic rename must work on our chain
    val dir = Files.createTempDirectory("nio-fs-rename")
    val src = new Path(dir.resolve("a.tmp").toUri)
    val dst = new Path(dir.resolve("a").toUri)
    val out = fc.create(src, java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE))
    out.write(42); out.close()
    fc.rename(src, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    assert(Files.exists(dir.resolve("a")) && !Files.exists(dir.resolve("a.tmp")))
    graft.streaming.StreamingRelational.deleteRecursively(dir)
  }
}
