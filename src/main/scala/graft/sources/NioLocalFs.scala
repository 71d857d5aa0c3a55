package graft.sources

import java.nio.file.Files
import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._
import java.util.EnumSet

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Fork-free local filesystem (wired as `spark.hadoop.fs.file.impl` by
  * [[graft.GraftSession]]).
  *
  * Without the native Hadoop library, `RawLocalFileSystem.setPermission`
  * shells out to `chmod` — one subprocess per created file/directory,
  * paid by every FileOutputCommitter mkdir/commit. On hosts where
  * spawning a child from a large-heap JVM is expensive (page-table-heavy
  * fork, audited clone/exec in sandboxes), that turns every parquet
  * write into seconds of blocked-not-computing driver time — measured
  * here at tens of seconds per spawn. The JDK can set POSIX permissions
  * natively, so this subclass routes `setPermission` through
  * `java.nio.file.Files.setPosixFilePermissions`: same semantics, zero
  * subprocesses. On a real cluster the data path is HDFS/S3A (never this
  * class) and the native lib is present anyway — this is a local-mode /
  * test-harness fix, not a production fork.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission != null) {
      val perms = EnumSet.noneOf(classOf[PosixFilePermission])
      val m = permission.toShort.toInt
      if ((m & 0x100) != 0) perms.add(OWNER_READ)
      if ((m & 0x80) != 0) perms.add(OWNER_WRITE)
      if ((m & 0x40) != 0) perms.add(OWNER_EXECUTE)
      if ((m & 0x20) != 0) perms.add(GROUP_READ)
      if ((m & 0x10) != 0) perms.add(GROUP_WRITE)
      if ((m & 0x8) != 0) perms.add(GROUP_EXECUTE)
      if ((m & 0x4) != 0) perms.add(OTHERS_READ)
      if ((m & 0x2) != 0) perms.add(OTHERS_WRITE)
      if ((m & 0x1) != 0) perms.add(OTHERS_EXECUTE)
      Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
    }
  }
}

/** The checksummed `file://` scheme wrapper over the fork-free raw FS —
  * what `fs.file.impl` actually points at (FileSystem impls need a
  * zero-arg constructor). */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)
