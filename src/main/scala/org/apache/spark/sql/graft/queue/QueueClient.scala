package org.apache.spark.sql.graft.queue

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

/** Transport abstraction for file-created notifications: the SQS concept
  * of the reference (`sqs/SqsClient.scala`) with the AWS specifics behind
  * an interface. At-least-once delivery is assumed; consumers dedup via
  * [[FileNotificationCache]]. `ack` removes a delivered message (SQS
  * DeleteMessageBatch).
  */
trait QueueClient {
  def poll(): Seq[FileNotification]
  def ack(handles: Seq[String]): Unit

  /** Park messages that exhausted their redelivery budget where an
    * operator can inspect them (SQS redrive-to-DLQ). Default transport
    * behavior is ack (drop) — overridden where the transport can move
    * the message aside instead.
    */
  def deadLetter(handles: Seq[String]): Unit = ack(handles)

  /** Release transport resources (background threads, connections).
    * Decorators forward; the default transport holds none.
    */
  def close(): Unit = ()
}

/** Directory-backed queue: each message is a JSON file
  * `{"path": "<data file>", "timestamp": <ms>}` in the queue directory
  * (the shape of an S3 event notification, minus the AWS envelope). The
  * ack handle is the message file itself; acking deletes it. Any system
  * that can drop a file can produce into this queue, which is exactly the
  * coupling S3→SNS→SQS gave the reference.
  */
class DirectoryQueueClient(queueDir: String) extends QueueClient {
  private val PathRe: Regex = "\"path\"\\s*:\\s*\"([^\"]+)\"".r.unanchored
  private val TsRe: Regex = "\"timestamp\"\\s*:\\s*(\\d+)".r.unanchored

  override def poll(): Seq[FileNotification] = {
    val dir = Paths.get(queueDir)
    if (!Files.isDirectory(dir)) return Seq.empty
    // Files.list holds an open DirectoryStream until closed — poll runs
    // every trigger, so leaking it exhausts file descriptors
    val stream = Files.list(dir)
    val msgs =
      try stream.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".json"))
        .flatMap(parse)
        .toList
      finally stream.close()
    msgs.sortBy(n => (n.timestamp, n.path))
  }

  private def parse(msg: Path): Option[FileNotification] = {
    val body =
      try new String(Files.readAllBytes(msg), StandardCharsets.UTF_8)
      catch { case _: java.io.IOException => return None } // acked mid-poll
    for {
      m <- PathRe.findFirstMatchIn(body)
      t <- TsRe.findFirstMatchIn(body)
    } yield FileNotification(m.group(1), t.group(1).toLong, msg.toString)
  }

  override def ack(handles: Seq[String]): Unit =
    handles.foreach(h => Files.deleteIfExists(Paths.get(h)))

  /** Poison messages move to `<queueDir>/.dlq/` (kept out of poll() by
    * the `.json`-in-root filter) instead of being deleted — the
    * directory-transport version of an SQS dead-letter queue.
    */
  override def deadLetter(handles: Seq[String]): Unit = {
    val dlq = Paths.get(queueDir, ".dlq")
    handles.foreach { h =>
      val src = Paths.get(h)
      if (Files.exists(src)) {
        Files.createDirectories(dlq)
        Files.move(src, dlq.resolve(src.getFileName),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }
}
