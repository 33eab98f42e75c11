package graft.hadoop

import java.io.OutputStream
import java.net.URI
import java.nio.file.{Files, Paths}
import java.nio.file.attribute.PosixFilePermission

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.{FsAction, FsPermission}

/** RawLocalFileSystem without the per-file process forks.
  *
  * Without libhadoop (no NativeIO in this environment), EVERY Hadoop
  * local-file create applies its FsPermission by FORKING `chmod` — a
  * multi-GB JVM fork per written file, ~100-200 ms of task time each
  * (found by thread-sampling the bench: every parquet-writing task sat
  * in `RawLocalFileSystem.setPermission → Shell.execCommand`;
  * optimization guide §1/§7). Here:
  *
  *  - creates write with the process umask (permission = null → plain
  *    FileOutputStream, no chmod at all);
  *  - explicit setPermission calls go through java.nio
  *    setPosixFilePermissions — a syscall, not a fork.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {

  // RawLocalFileSystem inherits FileSystem.getScheme's throwing
  // default; graft.sinks.CommitLog's O_EXCL branch and its reclaim
  // capability gate both dispatch on the scheme
  override def getScheme: String = "file"

  override protected def createOutputStreamWithMode(
      f: Path, append: Boolean,
      permission: FsPermission): OutputStream =
    // null permission short-circuits the chmod path entirely: the file
    // is born with the process umask, exactly what a local engine wants
    super.createOutputStreamWithMode(f, append, null)

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val perms = new java.util.HashSet[PosixFilePermission]()
    def add(a: FsAction, r: PosixFilePermission, w: PosixFilePermission,
            x: PosixFilePermission): Unit = {
      if (a.implies(FsAction.READ)) perms.add(r)
      if (a.implies(FsAction.WRITE)) perms.add(w)
      if (a.implies(FsAction.EXECUTE)) perms.add(x)
    }
    add(permission.getUserAction, PosixFilePermission.OWNER_READ,
      PosixFilePermission.OWNER_WRITE, PosixFilePermission.OWNER_EXECUTE)
    add(permission.getGroupAction, PosixFilePermission.GROUP_READ,
      PosixFilePermission.GROUP_WRITE, PosixFilePermission.GROUP_EXECUTE)
    add(permission.getOtherAction, PosixFilePermission.OTHERS_READ,
      PosixFilePermission.OTHERS_WRITE, PosixFilePermission.OTHERS_EXECUTE)
    Files.setPosixFilePermissions(Paths.get(pathToFile(p).getPath), perms)
  }
}

/** Local `file://` FileSystem without per-file chmod forks or checksum
  * twins — wired via `spark.hadoop.fs.file.impl` in
  * [[graft.GraftSession]].
  *
  * Extends the stock [[LocalFileSystem]] (Spark's RocksDB state-store
  * file manager downcasts the `file` scheme to it) but with
  *
  *  - the no-fork [[NioRawLocalFileSystem]] as the raw layer, and
  *  - client-side checksums OFF both ways: no `.crc` twin create (and
  *    its own would-be chmod fork) per written file, no `.crc` lookups
  *    on read. Parquet footers already checksum the data; production
  *    schemes (HDFS/S3) checksum server-side; this class is local-mode
  *    only.
  *
  * Scheme, inode create/delete and O_EXCL semantics are unchanged —
  * [[graft.sinks.CommitLog]]'s kernel-atomic CAS branch and its reclaim
  * capability gate behave exactly as on the stock local filesystem. On
  * a real cluster the data plane is hdfs:///s3a:// and this class is
  * simply never instantiated.
  */
class NioLocalFileSystem
    extends LocalFileSystem(new NioRawLocalFileSystem) {

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}

/** The FileContext (AbstractFileSystem) counterpart of
  * [[NioLocalFileSystem]], wired via
  * `spark.hadoop.fs.AbstractFileSystem.file.impl`. Structured
  * Streaming's CheckpointFileManager prefers the FileContext API for
  * its offset/commit logs and state-store files, so every micro-batch
  * otherwise pays the stock local AbstractFileSystem's chmod fork and
  * `.crc` twin per checkpoint file — the same costs the FileSystem-API
  * class removes for batch writes. Delegates straight to the no-fork
  * raw layer (FileContext's rename-overwrite is RawLocal's
  * kernel-atomic File.renameTo, which the checkpoint manager's
  * atomic-write contract needs). */
class NioLocalFs(uri: URI, conf: Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new NioRawLocalFileSystem, conf, "file", false)
