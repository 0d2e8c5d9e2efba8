package graft.io

import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.{FsAction, FsPermission}

/** `file:` scheme filesystem without the process forks.
  *
  * Hadoop's RawLocalFileSystem forks a `chmod` child process from
  * `setPermission` whenever libhadoop.so is absent — and `setPermission`
  * runs on EVERY file create and mkdir (stack-sampling the table-op bench
  * put the fork at ~10% of driver samples, and every executor task
  * writing a parquet part pays it too). This subclass sets permissions
  * through java.nio — one syscall, no fork. Registering it for `file:`
  * also replaces ChecksumFileSystem (the default LocalFileSystem
  * wrapper), so `.crc` sidecars are neither written nor checked: half
  * the small-file creates on every commit. Parquet carries its own page
  * -level integrity; the transactional layer's atomicity discipline is
  * length+mtime based, not CRC based.
  *
  * Non-POSIX filesystems fall back to the parent implementation.
  */
class FastLocalFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {

  private def toPosix(p: FsPermission): java.util.Set[java.nio.file.attribute.PosixFilePermission] = {
    import java.nio.file.attribute.PosixFilePermission._
    val s = java.util.EnumSet.noneOf(classOf[java.nio.file.attribute.PosixFilePermission])
    val u = p.getUserAction
    val g = p.getGroupAction
    val o = p.getOtherAction
    if (u.implies(FsAction.READ)) s.add(OWNER_READ)
    if (u.implies(FsAction.WRITE)) s.add(OWNER_WRITE)
    if (u.implies(FsAction.EXECUTE)) s.add(OWNER_EXECUTE)
    if (g.implies(FsAction.READ)) s.add(GROUP_READ)
    if (g.implies(FsAction.WRITE)) s.add(GROUP_WRITE)
    if (g.implies(FsAction.EXECUTE)) s.add(GROUP_EXECUTE)
    if (o.implies(FsAction.READ)) s.add(OTHERS_READ)
    if (o.implies(FsAction.WRITE)) s.add(OTHERS_WRITE)
    if (o.implies(FsAction.EXECUTE)) s.add(OTHERS_EXECUTE)
    s
  }

  override def setPermission(p: Path, permission: FsPermission): Unit =
    try {
      java.nio.file.Files.setPosixFilePermissions(
        pathToFile(p).toPath, toPosix(permission))
      ()
    } catch {
      // sticky bits can't arrive here (FsPermission#toShort's low 9 bits
      // are what toPosix reads); non-POSIX stores take the parent's path
      case _: UnsupportedOperationException =>
        super.setPermission(p, permission)
    }
}
