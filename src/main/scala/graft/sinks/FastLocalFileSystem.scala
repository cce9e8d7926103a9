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
