package org.apache.spark.sql.graft.queue

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{FileStreamSource, FileStreamSourceLog, FileStreamSourceOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Streaming Source fed by file-created NOTIFICATIONS instead of
  * directory listing — at large scale, listing an S3 prefix per
  * micro-batch is O(files) API calls and minutes of latency; a
  * notification queue is O(new files).
  *
  * Re-expresses the reference's `sqs/SqsSource.scala:42-116` on the same
  * Spark SPI (`StreamSourceProvider`/`Source`, the extension point the
  * reference and other public file-notification connectors use; this
  * package sits under `org.apache.spark.sql` for the same `private[sql]`
  * access the reference took via `org.apache.spark.sql.streaming.sqs`):
  *  - poll the queue, dedup against the seen-file cache, purge by age;
  *  - cut micro-batches of at most `maxFilesPerTrigger` files, recorded in
  *    a `FileStreamSourceLog` so recovery replays the exact same batch
  *    (exactly-once with the checkpointed offset log);
  *  - ack (delete) consumed messages only after the batch is logged;
  *  - `getBatch` resolves the logged file list straight into a relation of
  *    `fileFormat`, so Catalyst still sees an ordinary file scan
  *    (pushdown/pruning apply per micro-batch).
  *
  * Differences from the reference: polling is synchronous in `getOffset`
  * (no background fetch thread — AvailableNow semantics stay
  * deterministic), and redelivered notifications of committed files are
  * dropped instead of re-ingested (see [[FileNotificationCache]]).
  */
class QueueFileSource(
    sparkSession: SparkSession,
    metadataPath: String,
    options: Map[String, String],
    override val schema: StructType)
  extends Source {

  private val queueDir = options.getOrElse("queue.dir",
    throw new IllegalArgumentException("option 'queue.dir' is required"))
  private val fileFormat = options.getOrElse("fileFormat", "parquet")
  private val maxFilesPerTrigger = options.get("maxFilesPerTrigger").map(_.toInt).getOrElse(0)
  private val maxFileAgeMs = options.get("maxFileAgeMs").map(_.toLong).getOrElse(7L * 24 * 3600 * 1000)

  // Transport + SQS-semantics decorators (visibility leases, redrive to
  // DLQ, transient-failure retry) — all off/neutral by default, enabled
  // via options: visibilityTimeoutMs, maxReceiveCount, retry.attempts,
  // retry.backoffMs. See [[QueueDecorators]].
  private[queue] val client: QueueClient =
    QueueDecorators.fromOptions(new DirectoryQueueClient(queueDir), options)
  private[queue] val cache = new FileNotificationCache(maxFileAgeMs)

  private val metadataLog = new FileStreamSourceLog(FileStreamSourceLog.VERSION, sparkSession, metadataPath)
  private var logOffset = metadataLog.getLatest().map(_._1).getOrElse(-1L)
  // Recovery: files already in the log are committed, not new.
  metadataLog.allFiles().foreach { e =>
    cache.add(FileNotification(e.path, e.timestamp, ackHandle = ""))
    cache.markCommitted(e.path)
  }

  override def getOffset: Option[Offset] = synchronized {
    val (fresh, dup) = client.poll().partition(n => cache.isNewFile(n.path))
    fresh.foreach(cache.add)
    // Redeliveries of COMMITTED files are acked now: their batch's ack
    // only covered the handles stored at first sight, so a crash between
    // the metadata-log write and the ack would otherwise leave messages
    // that re-poll forever. Redeliveries of PENDING files (seen but not
    // yet in a logged batch) must stay in the queue — the message may be
    // the file's ONLY copy (DirectoryQueueClient handles are the message
    // path itself), and ack-before-log loses the file if we crash before
    // its batch is cut. They re-poll as dups until committed.
    client.ack(dup.filter(n => cache.isCommitted(n.path))
      .map(_.ackHandle).filter(_.nonEmpty))
    val batch = cache.getUncommitted(maxFilesPerTrigger)
    if (batch.nonEmpty) {
      logOffset += 1
      // a failed add means the batch id exists with DIFFERENT content —
      // acking these files would lose them permanently, so fail loudly
      // (FileStreamSource asserts the same way)
      require(metadataLog.add(logOffset, batch.map { case (p, f) =>
        FileStreamSource.FileEntry(path = p, timestamp = f.timestamp, batchId = logOffset)
      }.toArray), s"queue source: batch $logOffset already exists in the metadata log")
      batch.foreach { case (p, _) => cache.markCommitted(p) }
      client.ack(batch.map(_._2.ackHandle).filter(_.nonEmpty))
    }
    cache.purge()
    if (logOffset == -1) None else Some(FileStreamSourceOffset(logOffset))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val startOffset = start.map(FileStreamSourceOffset(_).logOffset).getOrElse(-1L)
    val endOffset = FileStreamSourceOffset(end).logOffset
    val files = metadataLog.get(Some(startOffset + 1), Some(endOffset)).flatMap(_._2)
    // entries store the notification's RAW path; a URI round-trip would
    // reject spaces and percent-decode literal % sequences
    val relation = DataSource(
      sparkSession,
      paths = files.map(f => new Path(f.path).toString).toSeq,
      userSpecifiedSchema = Some(schema),
      className = fileFormat,
      options = options).resolveRelation(checkFilesExist = false)
    Dataset.ofRows(sparkSession, LogicalRelation(relation, isStreaming = true))
  }

  override def commit(end: Offset): Unit = () // ack already happened post-log

  override def stop(): Unit = client.close() // stops a prefetch thread, if any

  override def toString: String = s"QueueFileSource[$queueDir]"
}

/** Registers `format("graft-queue")`. */
class QueueFileSourceProvider extends DataSourceRegister with StreamSourceProvider {

  override def shortName(): String = "graft-queue"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isDefined, "graft-queue source requires an explicit schema")
    (shortName(), schema.get)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new QueueFileSource(
      sqlContext.sparkSession.asInstanceOf[SparkSession],
      metadataPath, parameters, schema.get)
}
