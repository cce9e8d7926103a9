package org.apache.spark.sql.graft.queue

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ListBuffer
import scala.jdk.CollectionConverters._

/** One file-created notification from the queue transport. */
case class FileNotification(path: String, timestamp: Long, ackHandle: String)

/** Tracked state for a notified file. */
case class TrackedFile(timestamp: Long, isCommitted: Boolean, ackHandle: String)

/** Seen-file cache for the queue-notification source: dedups re-delivered
  * notifications, hands out uncommitted files in timestamp order, and
  * age-purges so the map stays bounded on an unbounded stream.
  *
  * Re-expresses the reference's `sqs/SqsFileCache.scala:17-106` with two
  * deliberate changes:
  *  - `getUncommitted` SORTS by (timestamp, path) before truncating to
  *    maxFilesPerTrigger — the reference iterated a ConcurrentHashMap, so
  *    batch membership was hash-order (nondeterministic, and old files
  *    could starve);
  *  - committed entries survive until they age out (the reference purged
  *    them immediately, so a redelivered notification — SQS is
  *    at-least-once — was treated as a NEW file and ingested twice; this
  *    is the queue-side twin of its Hudi duplicate repro, README.md:115-122).
  */
class FileNotificationCache(maxAgeMs: Long) {
  require(maxAgeMs >= 0, s"maxAgeMs must be >= 0, got $maxAgeMs")

  private val files = new ConcurrentHashMap[String, TrackedFile]
  @volatile private var latestTimestamp: Long = 0L
  @volatile private var lastPurgeTimestamp: Long = -1L

  def isNewFile(path: String): Boolean = !files.containsKey(path)

  /** Whether `path` is tracked AND its batch is in the metadata log. */
  def isCommitted(path: String): Boolean = {
    val f = files.get(path)
    f != null && f.isCommitted
  }

  def add(n: FileNotification): Unit = {
    files.putIfAbsent(n.path, TrackedFile(n.timestamp, isCommitted = false, n.ackHandle))
    if (n.timestamp > latestTimestamp) latestTimestamp = n.timestamp
  }

  /** Oldest-first uncommitted files, at most `max` (0 or negative = all). */
  def getUncommitted(max: Int): Seq[(String, TrackedFile)] = {
    val uncommitted = ListBuffer[(String, TrackedFile)]()
    files.asScala.foreach { case (p, f) => if (!f.isCommitted) uncommitted += ((p, f)) }
    val sorted = uncommitted.sortBy { case (p, f) => (f.timestamp, p) }
    if (max > 0) sorted.take(max).toSeq else sorted.toSeq
  }

  def markCommitted(path: String): Unit = {
    val f = files.get(path)
    if (f != null) files.replace(path, f.copy(isCommitted = true))
  }

  /** Remove entries older than (latest − maxAge); returns #removed. Only
    * age evicts — committed entries keep absorbing redeliveries until old.
    */
  def purge(): Int = {
    lastPurgeTimestamp = latestTimestamp - maxAgeMs
    var removed = 0
    files.asScala.foreach { case (p, f) =>
      if (f.timestamp < lastPurgeTimestamp) { files.remove(p); removed += 1 }
    }
    removed
  }

  def size: Int = files.size()
}
