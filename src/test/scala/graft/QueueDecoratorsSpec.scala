package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.queue._

/** SQS-semantics decorators over the queue SPI: visibility leases,
  * redrive-to-DLQ, bounded retry. Pure JVM — no Spark session needed.
  */
class QueueDecoratorsSpec extends AnyFunSuite {

  private def mkQueue(n: Int): (String, DirectoryQueueClient) = {
    val dir = Files.createTempDirectory("graft-qdec").toFile.getAbsolutePath
    (0 until n).foreach { i =>
      Files.write(Paths.get(s"$dir/m$i.json"),
        s"""{"path": "/data/f$i.parquet", "timestamp": ${100 + i}}"""
          .getBytes(StandardCharsets.UTF_8))
    }
    (dir, new DirectoryQueueClient(dir))
  }

  test("visibility: a delivered message is invisible until its lease lapses, then redelivers") {
    val (_, raw) = mkQueue(2)
    var now = 1000L
    val c = new VisibilityQueueClient(raw, visibilityTimeoutMs = 500, 0, () => now)
    assert(c.poll().map(_.path).sorted ==
      Seq("/data/f0.parquet", "/data/f1.parquet"))
    // leased: immediate re-poll sees nothing, the transport still holds both
    assert(c.poll().isEmpty)
    assert(raw.poll().size == 2)
    now += 499
    assert(c.poll().isEmpty, "lease must hold for the full timeout")
    now += 1
    assert(c.poll().size == 2, "unacked messages redeliver after the lease")
  }

  test("visibility: ack inside the lease removes the message for good") {
    val (_, raw) = mkQueue(2)
    var now = 0L
    val c = new VisibilityQueueClient(raw, 500, 0, () => now)
    val first = c.poll()
    c.ack(first.filter(_.path.endsWith("f0.parquet")).map(_.ackHandle))
    now += 1000
    assert(c.poll().map(_.path) == Seq("/data/f1.parquet"))
  }

  test("redrive: a message past maxReceiveCount moves to the DLQ and stops delivering") {
    val (dir, raw) = mkQueue(1)
    var now = 0L
    val c = new VisibilityQueueClient(raw, 10, maxReceiveCount = 3, () => now)
    (1 to 3).foreach { i =>
      assert(c.poll().size == 1, s"delivery $i within budget")
      now += 11
    }
    // 4th receive exceeds the budget: redriven, not delivered
    assert(c.poll().isEmpty)
    assert(!Files.exists(Paths.get(s"$dir/m0.json")), "poison message left the queue")
    assert(Files.exists(Paths.get(s"$dir/.dlq/m0.json")),
      "poison message parked in the DLQ, not deleted")
    // and the DLQ'd message never re-polls
    now += 100
    assert(c.poll().isEmpty)
  }

  test("retry: transient poll failures are retried with backoff; persistent ones surface") {
    class Flaky(failures: Int) extends QueueClient {
      var calls = 0
      def poll(): Seq[FileNotification] = {
        calls += 1
        if (calls <= failures) throw new java.io.IOException(s"transient $calls")
        Seq(FileNotification("/data/x.parquet", 1L, "h"))
      }
      def ack(handles: Seq[String]): Unit = ()
    }
    val slept = scala.collection.mutable.ArrayBuffer[Long]()
    val ok = new RetryingQueueClient(new Flaky(2), maxAttempts = 3, backoffMs = 7, slept += _)
    assert(ok.poll().size == 1)
    assert(slept.toSeq == Seq(7, 14), "linear backoff per attempt")
    val dead = new RetryingQueueClient(new Flaky(5), maxAttempts = 3, backoffMs = 1, _ => ())
    val e = intercept[java.io.IOException](dead.poll())
    assert(e.getMessage == "transient 3", "fails with the last attempt's error")
  }

  test("options wiring: decorators engage only when configured") {
    val (_, raw) = mkQueue(1)
    assert(QueueDecorators.fromOptions(raw,
      Map("retry.attempts" -> "1")) eq raw)
    val wrapped = QueueDecorators.fromOptions(raw,
      Map("visibilityTimeoutMs" -> "500", "retry.attempts" -> "1"))
    assert(wrapped.isInstanceOf[VisibilityQueueClient])
    assert(QueueDecorators.fromOptions(raw, Map.empty)
      .isInstanceOf[RetryingQueueClient], "retry wraps by default")
  }

  test("redrive without a visibility lease is refused (backlog would exhaust the budget)") {
    val (_, raw) = mkQueue(1)
    val e = intercept[IllegalArgumentException](
      QueueDecorators.fromOptions(raw, Map("maxReceiveCount" -> "3")))
    assert(e.getMessage.contains("visibilityTimeoutMs"))
  }

  test("a transient poll miss neither lifts a lease nor resets the receive count") {
    // transport that drops one message from a single poll (an IO blip or
    // a paged receive) — its lease/receive state must survive the miss
    class Blinky(underlying: QueueClient) extends QueueClient {
      var blink = false
      def poll(): Seq[FileNotification] = {
        val all = underlying.poll()
        if (blink) all.tail else all
      }
      def ack(handles: Seq[String]): Unit = underlying.ack(handles)
    }
    val (_, raw) = mkQueue(2)
    val blinky = new Blinky(raw)
    var now = 0L
    val c = new VisibilityQueueClient(blinky, 500, maxReceiveCount = 2, () => now)
    assert(c.poll().size == 2) // receives=1 each, leased to 500
    blinky.blink = true
    now += 100
    assert(c.poll().isEmpty, "missing message must not be treated as new")
    blinky.blink = false
    now += 100 // still inside the original lease
    assert(c.poll().isEmpty, "the miss must not have lifted the lease")
    now += 400 // lease lapsed: second (and last in-budget) delivery
    assert(c.poll().size == 2)
    now += 600 // third delivery would exceed maxReceiveCount=2 → redriven
    assert(c.poll().isEmpty)
    assert(raw.poll().isEmpty, "poison messages left the queue for the DLQ")
  }

  test("prefetch: consumer polls read the buffered snapshot; ack flows through; close stops the thread") {
    val (dir, raw) = mkQueue(2)
    val c = new PrefetchingQueueClient(raw, intervalMs = 3600000L) // no bg ticks
    try {
      assert(c.poll().isEmpty, "nothing buffered before the first refill")
      c.refill()
      val polled = c.poll()
      assert(polled.map(_.path) == Seq("/data/f0.parquet", "/data/f1.parquet"),
        "buffer drains in (timestamp, path) order like the transport")
      // a new message is invisible until the next refill — the documented
      // staleness window
      Files.write(Paths.get(s"$dir/m9.json"),
        """{"path": "/data/f9.parquet", "timestamp": 999}"""
          .getBytes(StandardCharsets.UTF_8))
      assert(c.poll().size == 2)
      c.refill()
      assert(c.poll().size == 3)
      // ack reaches the transport AND evicts from the buffer immediately
      c.ack(polled.map(_.ackHandle))
      assert(c.poll().map(_.path) == Seq("/data/f9.parquet"))
      assert(raw.poll().map(_.path) == Seq("/data/f9.parquet"))
    } finally c.close() // close joins the thread
    val lingering = Thread.getAllStackTraces.keySet().toArray
      .map(_.asInstanceOf[Thread])
      .exists(t => t.getName == "graft-queue-prefetch" && t.isAlive)
    assert(!lingering, "prefetch thread must stop on close")
  }

  test("dlq directory is never polled as queue messages") {
    val (dir, raw) = mkQueue(2)
    raw.deadLetter(Seq(s"$dir/m0.json"))
    assert(raw.poll().map(_.path) == Seq("/data/f1.parquet"))
  }
}
