package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Fork-free local filesystem for streaming checkpoints on `file://`.
  *
  * Hadoop's [[RawLocalFileSystem]] without the native `libhadoop`
  * library (the usual local[*] situation — Spark does not bundle it)
  * implements `setPermission` by FORKING a `chmod` process
  * (`Shell.execCommand`), and every checkpoint-file create passes a
  * permission, so each state-store commit pays one-to-several process
  * forks per file: delta file, Spark 4.1 checksum sidecar, and — via
  * the default `ChecksumFs` AbstractFileSystem — a `.crc` twin for
  * each. A stream-stream join at 32 shuffle partitions × 4 stores per
  * trigger forks HUNDREDS of processes per micro-batch, so its
  * wall-clock measures the host's fork+exec latency (observed 3-4×
  * apart across VM kernels: ~0.7-3 ms each) instead of the engine —
  * the r15-r17 stream-join-witness variance, root-caused by thread
  * sampling (`ProcessImpl.forkAndExec` under
  * `RawLocalFileSystem.setPermission`; see BENCH.md r17).
  *
  * [[NioLocalFs]] overrides `setPermission` with
  * `java.nio.file.Files.setPosixFilePermissions` — the same
  * permission change as `chmod`, as one syscall, no fork. Exotic mode
  * bits nio cannot express (setuid/setgid/sticky) fall back to the
  * shell path. [[NioLocalAfs]] is its `AbstractFileSystem` binding
  * for the `FileContext` API — the API Spark's
  * `CheckpointFileManager` actually uses — registered via
  * `spark.hadoop.fs.AbstractFileSystem.file.impl`. Binding the
  * delegate DIRECTLY (not through `ChecksumFs`) also drops the `.crc`
  * twin per checkpoint file; integrity of checkpoint files is owned
  * by Spark's own checksum layer
  * (`spark.sql.streaming.checkpoint.fileChecksum.enabled`, default
  * on), so the Hadoop-level CRC was a second, redundant integrity
  * layer at double the file count.
  *
  * Production checkpoints live on HDFS/S3/ABFS where none of this
  * applies — this class exists so local[*] runs (development, CI,
  * benchmarks) measure the engine rather than guest fork latency. */
class NioLocalFs extends RawLocalFileSystem {
  /** `FileContext.rename` calls this on both endpoints, and the stock
    * implementation answers the "is it a symlink?" question by
    * FORKING a `readlink` process per call (`FileUtil.readLink`) —
    * after the setPermission fix this was the single largest
    * remaining fork source (314 of ~370 fork samples). One nio
    * NOFOLLOW attribute read answers it syscall-only; the (never hit
    * by checkpoints) genuine-symlink case falls back to the stock
    * path, which also serves as the error path so semantics for
    * missing files (FileNotFoundException shape) stay Hadoop's. */
  override def getFileLinkStatus(f: Path)
      : org.apache.hadoop.fs.FileStatus = {
    val nioPath =
      try pathToFile(f).toPath
      catch { case _: Throwable => return super.getFileLinkStatus(f) }
    val isLink =
      try java.nio.file.Files.readAttributes(nioPath,
        classOf[java.nio.file.attribute.BasicFileAttributes],
        java.nio.file.LinkOption.NOFOLLOW_LINKS).isSymbolicLink
      catch { case _: Throwable => return super.getFileLinkStatus(f) }
    if (isLink) super.getFileLinkStatus(f)
    else getFileStatus(f)
  }

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits = permission.toShort.toInt
    if ((bits & 0xE00) != 0) super.setPermission(p, permission)
    else {
      import java.nio.file.attribute.PosixFilePermission._
      val set = new java.util.HashSet[
        java.nio.file.attribute.PosixFilePermission]()
      def add(mask: Int,
          perm: java.nio.file.attribute.PosixFilePermission): Unit =
        if ((bits & mask) != 0) { set.add(perm); () }
      add(0x100, OWNER_READ); add(0x80, OWNER_WRITE)
      add(0x40, OWNER_EXECUTE)
      add(0x20, GROUP_READ); add(0x10, GROUP_WRITE)
      add(0x8, GROUP_EXECUTE)
      add(0x4, OTHERS_READ); add(0x2, OTHERS_WRITE)
      add(0x1, OTHERS_EXECUTE)
      try {
        java.nio.file.Files.setPosixFilePermissions(
          pathToFile(p).toPath, set)
        ()
      } catch {
        // non-POSIX store or races on a vanished temp file — the
        // shell path is the behavior-identical fallback
        case _: UnsupportedOperationException |
            _: java.io.IOException =>
          super.setPermission(p, permission)
      }
    }
  }
}

/** [[NioLocalFs]] as an `AbstractFileSystem` for the `FileContext`
  * API (Spark's checkpoint managers resolve through it):
  * `spark.hadoop.fs.AbstractFileSystem.file.impl =
  * graft.sources.NioLocalAfs`. */
class NioLocalAfs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new NioLocalFs, conf, "file", false)
