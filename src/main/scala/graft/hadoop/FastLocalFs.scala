package graft.hadoop

import java.nio.file.attribute.PosixFilePermission
import java.util.EnumSet

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/**
 * `file://` FileSystem that sets permissions through java.nio instead of
 * forking a `chmod` child process.
 *
 * Without the Hadoop native library (absent in this sandbox, and in most
 * slim container images), `RawLocalFileSystem.setPermission` falls back to
 * `Shell.execCommand("chmod", ...)` — a fork+exec per call — and every
 * local parquet file create runs it at least twice (task-attempt dir mkdirs
 * + the file's own create-time permission), so a micro-batch writing a few
 * dozen small files spends more driver/executor wall forking `chmod`
 * children than writing bytes. Thread-dump sampling of the bench attributed
 * ~20% of RUNNABLE driver samples to `Shell.runCommand` under exactly these
 * stacks (guide §7.3). `Files.setPosixFilePermissions` is the same syscall
 * (`fchmodat`) without the process launch.
 *
 * Wired via `spark.hadoop.fs.file.impl` (build.sbt javaOptions for the
 * sbt-forked bench/test JVMs). Cluster deployments talk to HDFS/object
 * stores for data — this class only matters where `file://` is on a hot
 * path, which is precisely the local bench/CI shape. Semantics are
 * unchanged: same checksummed LocalFileSystem behavior, same permission
 * bits; the rare modes java.nio cannot express (sticky/setuid/setgid)
 * delegate to the stock shell path.
 */
class FastLocalFileSystem extends LocalFileSystem(new FastRawLocalFileSystem)

class FastRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits: Int = permission.toShort.toInt
    // sticky/setuid/setgid bits have no PosixFilePermission encoding
    if ((bits & 0xE00) != 0) super.setPermission(p, permission)
    else {
      val perms = EnumSet.noneOf(classOf[PosixFilePermission])
      import PosixFilePermission._
      val order = Seq(
        OWNER_READ, OWNER_WRITE, OWNER_EXECUTE,
        GROUP_READ, GROUP_WRITE, GROUP_EXECUTE,
        OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE)
      order.zipWithIndex.foreach { case (perm, i) =>
        if ((bits & (1 << (8 - i))) != 0) perms.add(perm): Unit
      }
      try java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
      catch {
        // non-POSIX store mounted at a file: path — the stock path still works
        case _: UnsupportedOperationException => super.setPermission(p, permission)
        case e: java.nio.file.NoSuchFileException =>
          throw new java.io.FileNotFoundException(e.getFile)
      }
    }
  }
}
