package graft.sources

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` filesystem with JVM-native permission handling.
  *
  * Hadoop's `RawLocalFileSystem` applies permissions by FORKING a
  * `chmod` process for every created file and directory when the
  * native hadoop library is absent (`NativeIO.isAvailable == false`,
  * which is this harness and any vanilla-JVM deployment — the startup
  * log's "unable to load native-hadoop library" warning). Every
  * staged dir, every task file, every committer temp dir pays a
  * ~10–25 ms fork+exec+wait (round-20 stack sampling: `Shell.runCommand
  * <- RawLocalFileSystem.setPermission` hot in the commit-path driver
  * profile). `java.nio.file.Files.setPosixFilePermissions` sets the
  * same POSIX bits in-process.
  *
  * Both fork sites (`LocalFSFileOutputStream`'s permissioned create
  * and `mkOneDirWithMode`) dispatch through the VIRTUAL
  * `setPermission`, so one override intercepts them. Special bits NIO
  * cannot express (sticky/setuid/setgid) fall back to the stock shell
  * path — semantics identical, only the mechanism changes. Registered
  * by the harness via `spark.hadoop.fs.file.impl`; production
  * clusters on HDFS/S3 never route through this class at all. */
final class NioLocalFileSystem
  extends LocalFileSystem(new NioRawLocalFileSystem)

final class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    val m: Int = permission.toShort.toInt & 0xFFF
    if ((m & 0xE00) != 0) { super.setPermission(p, permission); return }
    import java.nio.file.attribute.PosixFilePermission._
    val perms = java.util.EnumSet.noneOf(
      classOf[java.nio.file.attribute.PosixFilePermission])
    if ((m & 0x100) != 0) perms.add(OWNER_READ)
    if ((m & 0x080) != 0) perms.add(OWNER_WRITE)
    if ((m & 0x040) != 0) perms.add(OWNER_EXECUTE)
    if ((m & 0x020) != 0) perms.add(GROUP_READ)
    if ((m & 0x010) != 0) perms.add(GROUP_WRITE)
    if ((m & 0x008) != 0) perms.add(GROUP_EXECUTE)
    if ((m & 0x004) != 0) perms.add(OTHERS_READ)
    if ((m & 0x002) != 0) perms.add(OTHERS_WRITE)
    if ((m & 0x001) != 0) perms.add(OTHERS_EXECUTE)
    try java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
    catch {
      case _: UnsupportedOperationException => // non-POSIX store
        super.setPermission(p, permission)
      case e: java.nio.file.NoSuchFileException =>
        throw new java.io.FileNotFoundException(e.getMessage)
    }
    ()
  }
}
