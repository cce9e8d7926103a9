package graft.sinks

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local `file:` filesystem adapter for environments WITHOUT the native
  * Hadoop library (libhadoop.so): stock Hadoop then implements every
  * permission change by FORKING a `chmod` process
  * (`RawLocalFileSystem.setPermission` → `Shell.execCommand`), and the
  * checksummed local filesystem shadows every file with a `.crc` — so
  * ONE staged parquet file costs two creates and up to four fork+exec
  * round trips (~20–60 ms each). Profiled on the bench: the
  * multi-commit lakehouse queries spent more executor time forking
  * chmod than writing data.
  *
  * Extends [[LocalFileSystem]] (Hadoop's `FileSystem.getLocal` casts to
  * it) around a raw filesystem whose [[RawLocalFileSystem.setPermission]]
  * is a no-op — files keep the process umask, which is what a
  * container/test environment wants anyway — and switches write/verify
  * checksums off, dropping the `.crc` shadow files. Parquet integrity
  * does not regress: the format carries its own page/footer checksums.
  *
  * Local-mode plumbing only: installed via `fs.file.impl` in
  * [[graft.GraftSession]]. Real deployments read and write s3a/hdfs/
  * abfs schemes, which never route through this class, and clusters
  * with the native library never fork in the first place.
  */
class FastLocalFileSystem extends LocalFileSystem(new RawLocalFileSystem {
      override def setPermission(p: Path, permission: FsPermission): Unit = ()
    }) {

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }

  /** Plain-java file status: stock Hadoop's lazy `loadPermissionInfo`
    * FORKS `ls -ld` (and `readlink` for links) the first time a
    * caller reads owner/permission off a status — and the FileContext
    * stack (streaming checkpoint managers, state stores) does read
    * them. Permissions are process-umask fiction on this filesystem
    * anyway (setPermission is a no-op above), so answer from NIO
    * attributes and never fork.
    */
  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    FastLocalFileSystem.nioStatus(this, f)

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    val st = getFileStatus(f) // throws FileNotFoundException like stock
    if (!st.isDirectory) return Array(st)
    val dir = java.nio.file.Paths.get(f.toUri.getPath)
    val out = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.FileStatus]()
    val ds = java.nio.file.Files.newDirectoryStream(dir)
    try {
      ds.forEach { p =>
        // skip checksum shadows: stock listing goes through
        // ChecksumFileSystem, which hides `.<name>.crc` entries —
        // directories written through stock local bindings before this
        // class was installed (pre-existing checkpoints, test fixtures)
        // still hold them, and surfacing a new entry class to every
        // lister would change listing semantics
        val name = p.getFileName.toString
        if (!org.apache.hadoop.fs.ChecksumFileSystem.isChecksumFile(new Path(f, name)))
          out += FastLocalFileSystem.nioStatus(this, new Path(f, name))
      }
    } finally ds.close()
    out.toArray
  }

  /** No-clobber rename, pinned explicitly: every lakehouse publish
    * protocol here (Delta/graft commit files, Iceberg metadata versions,
    * Hudi instants) relies on rename-refuses-existing for its optimistic
    * concurrency, and raw POSIX rename(2) silently overwrites. Same
    * check-then-act window as stock Hadoop local; the concurrent-writer
    * specs pin the behavior.
    */
  override def rename(src: Path, dst: Path): Boolean =
    if (exists(dst)) false else super.rename(src, dst)
}

object FastLocalFileSystem {

  private val DirPerm = new FsPermission(Integer.parseInt("755", 8).toShort)
  private val FilePerm = new FsPermission(Integer.parseInt("644", 8).toShort)

  /** FileStatus from NIO attributes in ONE stat call, permissions fixed
    * at umask-style defaults (never read back through a forked `ls`).
    */
  private[sinks] def nioStatus(fs: org.apache.hadoop.fs.FileSystem,
      f: Path): org.apache.hadoop.fs.FileStatus = {
    val p = java.nio.file.Paths.get(f.toUri.getPath)
    val attrs =
      try java.nio.file.Files.readAttributes(
        p, classOf[java.nio.file.attribute.BasicFileAttributes])
      catch {
        case _: java.nio.file.NoSuchFileException =>
          throw new java.io.FileNotFoundException(s"File $f does not exist")
      }
    val dir = attrs.isDirectory
    new org.apache.hadoop.fs.FileStatus(
      if (dir) 0L else attrs.size(), dir, 1,
      fs.getDefaultBlockSize(f), attrs.lastModifiedTime().toMillis,
      attrs.lastAccessTime().toMillis,
      if (dir) FastLocalFileSystem.DirPerm else FastLocalFileSystem.FilePerm,
      System.getProperty("user.name"), System.getProperty("user.name"),
      null,
      fs.makeQualified(f), false, false, false)
  }
}

/** [[FastLocalFileSystem]]'s FileContext-side twin, registered as the
  * `AbstractFileSystem` for the `file:` scheme. Structured Streaming's
  * checkpoint managers and state stores go through `FileContext`, whose
  * stock local binding (`LocalFs` = `ChecksumFs(RawLocalFs)`) pays the
  * same two local-mode taxes the `FileSystem` side already had removed:
  * a `.crc` shadow create+rename per metadata file (offset log, commit
  * log, every state-store delta) and fork+exec'd `ls`/`readlink` for
  * permission/symlink answers. Delegating to [[FastLocalFileSystem]]
  * keeps the no-clobber rename the rename-based checkpoint protocol
  * relies on. `file:` scheme only — cluster checkpoints live on
  * hdfs/s3a/abfs bindings, which never route through this class.
  */
class FastLocalFs(uri: URI, conf: Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new FastLocalFileSystem, conf, "file", false)
