package graft

/** Temp scratch dirs for the round-trip queries (write a table, read it
  * back): registered for recursive JVM-exit cleanup, so a bench/verify
  * run — which executes every round trip several times — does not
  * accumulate full table copies in /tmp for the machine's lifetime.
  */
object Scratch {

  /** Create a fresh temp directory and return its absolute path. */
  def dir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    val f = p.toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(f)))
    f.getAbsolutePath
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(delete))
    f.delete()
    ()
  }
}
