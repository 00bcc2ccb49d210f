package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Path}
import org.apache.hadoop.fs.permission.FsPermission

import graft.sources.NioLocalFs

/** The fork-free local filesystem behind the streaming-checkpoint
  * witnesses (see NioLocalFs's scaladoc and BENCH.md r17): the
  * permission and link-status answers must MATCH the stock shell
  * implementations — this class exists to remove process forks, never
  * to change filesystem semantics. */
class NioLocalFsSpec extends SparkSpec {

  private def freshDir(tag: String): java.io.File = {
    val d = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft-niofs-$tag-${ProcessHandle.current().pid()}")
    d.mkdirs()
    d
  }

  test("setPermission applies the exact mode bits via nio") {
    val fs = new NioLocalFs
    fs.initialize(URI.create("file:///"), new Configuration())
    val f = new java.io.File(freshDir("perm"), "a.txt")
    java.nio.file.Files.write(f.toPath, "x".getBytes)
    for (mode <- Seq(Integer.parseInt("600", 8),
        Integer.parseInt("644", 8), Integer.parseInt("755", 8))) {
      fs.setPermission(new Path(f.toString),
        new FsPermission(mode.toShort))
      val got = java.nio.file.Files.getPosixFilePermissions(f.toPath)
      val expect = java.nio.file.attribute.PosixFilePermissions
        .fromString(new FsPermission(mode.toShort).toString)
      assert(got === expect, s"mode ${mode.toOctalString}")
    }
  }

  test("getFileLinkStatus: nio answer for regular files, symlinks " +
    "still recognized, missing files still throw") {
    val fs = new NioLocalFs
    fs.initialize(URI.create("file:///"), new Configuration())
    val dir = freshDir("link")
    val f = new java.io.File(dir, "real.txt")
    java.nio.file.Files.write(f.toPath, "abc".getBytes)
    val st = fs.getFileLinkStatus(new Path(f.toString))
    assert(!st.isSymlink && st.getLen === 3)
    val link = new java.io.File(dir, "ln.txt")
    java.nio.file.Files.createSymbolicLink(link.toPath, f.toPath)
    assert(fs.getFileLinkStatus(new Path(link.toString)).isSymlink)
    intercept[java.io.FileNotFoundException] {
      fs.getFileLinkStatus(new Path(new java.io.File(dir, "no").toString))
    }
  }

  test("FileContext bound via NioLocalAfs: create/rename/read round-" +
    "trip with permissions, and no .crc twins") {
    val conf = new Configuration()
    conf.set("fs.AbstractFileSystem.file.impl",
      "graft.sources.NioLocalAfs")
    val fc = FileContext.getFileContext(URI.create("file:///"), conf)
    val dir = freshDir("fc")
    val tmp = new Path(new java.io.File(dir, "part.tmp").toString)
    val dst = new Path(new java.io.File(dir, "part").toString)
    val out = fc.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    out.write("payload".getBytes)
    out.close()
    fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    val in = fc.open(dst)
    val buf = new Array[Byte](7)
    in.readFully(0L, buf)
    in.close()
    assert(new String(buf) === "payload")
    // direct delegate, no ChecksumFs wrapper: no .crc twin files
    assert(dir.listFiles().map(_.getName).toSet === Set("part"),
      dir.listFiles().map(_.getName).mkString(","))
  }
}
