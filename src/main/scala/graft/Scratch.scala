package graft

/** Temp scratch dirs for the round-trip queries (write a table, read it
  * back): registered for recursive JVM-exit cleanup, so a bench/verify
  * run — which executes every round trip several times — does not
  * accumulate full table copies in /tmp for the machine's lifetime.
  */
object Scratch {

  // ONE shutdown hook draining a queue — a per-dir hook Thread would
  // accumulate for the JVM's lifetime (bench/verify create hundreds).
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var f = registered.poll()
      while (f != null) { delete(f); f = registered.poll() }
    }))

  // Prefer tmpfs for the throwaway tables: the round-trip queries write
  // and immediately re-read them, and on this container's virtual disk
  // each parquet create/fsync is ~100 ms of latency that measures the
  // disk, not the engine (same reasoning as StreamTuning.scratchDir for
  // checkpoints). Everything here is deleted at JVM exit.
  private lazy val base: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) shm
    else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
  }

  /** Create a fresh temp directory and return its absolute path. */
  def dir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(base, prefix)
    val f = p.toFile
    hookInstalled
    registered.add(f)
    f.getAbsolutePath
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(delete))
    f.delete()
    ()
  }
}
