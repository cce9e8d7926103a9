package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming-specific partitioning policy.
  *
  * `spark.sql.shuffle.partitions` plays a different role in Structured
  * Streaming than in batch: it is read once at the FIRST query start and
  * pinned into the checkpoint as the state-store partition count for the
  * query's whole life. So it must be sized to the expected STATE volume
  * (horizon rows ÷ target per-store size), not to batch parallelism —
  * every micro-batch pays one state-store commit (delta file + fsync)
  * per partition per stateful operator, so overshooting multiplies
  * fixed IO: 32 partitions × 4 stores (a stream-stream join keeps two
  * per side) = 128 fsyncs per batch before any data moves.
  *
  * Batch queries in the same session keep the session-wide setting; this
  * helper scopes the streaming value to a query's start.
  */
object StreamTuning {

  /** Default for the test horizons here (≤100k buffered rows). */
  val DefaultStatePartitions = 8

  /** Scratch dir for transient streaming metadata (checkpoints + state
    * stores). Prefers tmpfs (/dev/shm): every micro-batch fsyncs one
    * delta file per state store per partition plus the offset/commit
    * logs, and on a virtual disk each fsync is ~100 ms of pure latency —
    * the same reason production clusters point checkpointLocation at a
    * fast DFS rather than a cold object store. Data SINKS stay on the
    * regular filesystem; only restart metadata lives here.
    */
  def scratchDir(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createTempDirectory(base, prefix).toFile.getAbsolutePath
  }

  /** Run `body` (which should START the streaming query — the conf is
    * captured at start, so the running query keeps it) with the streaming
    * partition count, restoring the session's batch setting after.
    */
  def withStatePartitions[T](spark: SparkSession, n: Int = DefaultStatePartitions)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }
}
