package org.apache.spark.sql.graft.queue

import scala.collection.mutable

/** Transport-agnostic queue semantics the reference buried inside its
  * SQS client (`sqs/SqsClient.scala`: visibility-timeout handling and a
  * retry policy around every AWS call), re-expressed as decorators over
  * the [[QueueClient]] SPI so ANY transport gets them:
  *
  *  - [[VisibilityQueueClient]] — per-message delivery leases + a
  *    redelivery budget with dead-letter redrive (SQS visibility timeout
  *    + redrive policy);
  *  - [[RetryingQueueClient]] — bounded retry with linear backoff around
  *    transient transport failures.
  *
  * Both are pure wrappers: composition order is retry(visibility(raw))
  * or visibility(retry(raw)); [[QueueFileSource]] wires
  * retry(visibility(...)) so lease bookkeeping happens once per
  * successful poll, not once per attempt.
  */
object QueueDecorators {

  /** Build the decorator stack from source options. Order matters:
    * retry(visibility(prefetch(raw))) — prefetch sits CLOSEST to the
    * transport so its background refills never touch lease/receive
    * accounting (those are consumer-delivery concepts and must tick
    * only on consumer polls), and retry wraps the whole stack's
    * consumer-facing calls.
    */
  def fromOptions(raw: QueueClient, options: Map[String, String],
      clock: () => Long = System.currentTimeMillis): QueueClient = {
    val visibilityMs = options.get("visibilityTimeoutMs").map(_.toLong).getOrElse(0L)
    val maxReceives = options.get("maxReceiveCount").map(_.toInt).getOrElse(0)
    val attempts = options.get("retry.attempts").map(_.toInt).getOrElse(3)
    val backoffMs = options.get("retry.backoffMs").map(_.toLong).getOrElse(100L)
    val prefetchMs = options.get("prefetch.intervalMs").map(_.toLong).getOrElse(0L)
    require(maxReceives <= 0 || visibilityMs > 0,
      "maxReceiveCount requires visibilityTimeoutMs > 0: without a lease, " +
        "every trigger's poll counts as a receive and a healthy BACKLOG " +
        "exhausts the budget — receives must be rate-limited by the lease, " +
        "as SQS rate-limits them. Size maxReceiveCount × visibilityTimeoutMs " +
        "above the worst-case backlog drain time.")
    val fetched =
      if (prefetchMs > 0) new PrefetchingQueueClient(raw, prefetchMs)
      else raw
    val leased =
      if (visibilityMs > 0 || maxReceives > 0)
        new VisibilityQueueClient(fetched, visibilityMs, maxReceives, clock)
      else fetched
    if (attempts > 1) new RetryingQueueClient(leased, attempts, backoffMs)
    else leased
  }
}

/** SQS-style delivery semantics over any transport:
  *
  *  - **visibility timeout**: a delivered message is leased for
  *    `visibilityTimeoutMs` — subsequent polls of THIS consumer skip it
  *    until the lease lapses unacked. Lease state is in-memory by
  *    design: a crashed consumer's replacement starts lease-free, so
  *    every in-flight message becomes visible again — exactly the
  *    at-least-once redelivery SQS gives when a consumer dies holding
  *    leases. (0 disables.)
  *  - **redrive policy**: a message delivered more than
  *    `maxReceiveCount` times without ack is a poison message — its
  *    consumer keeps crashing before acking, and redelivering it
  *    forever wedges the pipeline. It is handed to the transport's
  *    [[QueueClient.deadLetter]] and no longer delivered. (0 disables;
  *    requires a nonzero visibility timeout so receives are
  *    lease-rate-limited, never once-per-trigger.) As with SQS, a
  *    consumer that holds messages unacked past
  *    maxReceiveCount × visibilityTimeout loses them to the DLQ — size
  *    the product above the worst-case backlog drain time (the
  *    [[QueueFileSource]] acks only after a file's batch is logged, so
  *    its pending backlog counts). The DLQ is a parking lot, not
  *    deletion: an operator redrives by moving the message back.
  *
  * Counting receives per ACK HANDLE: the directory transport redelivers
  * a message under the same handle (the message file path), so the
  * count survives across polls; a transport that mints fresh handles
  * per delivery (as SQS does) should count upstream — documented SPI
  * contract, same as SQS's ApproximateReceiveCount.
  */
class VisibilityQueueClient(
    underlying: QueueClient,
    visibilityTimeoutMs: Long,
    maxReceiveCount: Int,
    clock: () => Long = System.currentTimeMillis) extends QueueClient {

  private case class Delivery(var leaseUntil: Long, var receives: Int, var lastSeen: Long)
  private val state = mutable.HashMap[String, Delivery]()

  // State retention is TIME-based, never absence-based: a handle missing
  // from ONE poll is not gone — the transport may page (SQS returns ≤10
  // per receive) or a read may transiently fail — and evicting on a miss
  // would forget an unexpired lease (early redelivery) and reset the
  // receive count (a poison message never dead-letters). Entries expire
  // only after a horizon no live message goes unseen for.
  //
  // The flip side of TTL expiry, written down: counts live in THIS
  // consumer's memory, so a message unseen past the TTL — a stream
  // paused/stopped longer than ~10× the visibility timeout — re-enters
  // with a fresh receive budget, exactly like the restart case (SQS
  // itself keeps the count server-side and doesn't have this reset; a
  // transport that does should be decorated server-side). The redrive
  // guarantee is therefore per-consumer-incarnation: a poison message
  // dead-letters within maxReceiveCount polls of any SINGLE live run,
  // and the worst case across pauses is a re-paid budget per resume —
  // duplicate-delivery-safe downstream (the source's seen-file cache),
  // never lost.
  private val stateTtlMs =
    math.max(10 * math.max(visibilityTimeoutMs, 0L), 10L * 60 * 1000)

  override def poll(): Seq[FileNotification] = synchronized {
    val now = clock()
    val polled = underlying.poll()
    polled.foreach(n => state.get(n.ackHandle).foreach(_.lastSeen = now))
    state.filterInPlace { case (_, d) => now - d.lastSeen <= stateTtlMs }
    val (deliverable, poison) = polled.filter { n =>
      state.get(n.ackHandle).forall(_.leaseUntil <= now)
    }.partition { n =>
      maxReceiveCount <= 0 ||
        state.get(n.ackHandle).forall(_.receives < maxReceiveCount)
    }
    if (poison.nonEmpty) {
      underlying.deadLetter(poison.map(_.ackHandle))
      poison.foreach(n => state.remove(n.ackHandle))
    }
    deliverable.foreach { n =>
      val d = state.getOrElseUpdate(n.ackHandle, Delivery(0L, 0, now))
      d.receives += 1
      d.leaseUntil = if (visibilityTimeoutMs > 0) now + visibilityTimeoutMs else 0L
      d.lastSeen = now
    }
    deliverable
  }

  override def ack(handles: Seq[String]): Unit = synchronized {
    underlying.ack(handles)
    handles.foreach(state.remove)
  }

  override def deadLetter(handles: Seq[String]): Unit = synchronized {
    underlying.deadLetter(handles)
    handles.foreach(state.remove)
  }

  override def close(): Unit = underlying.close()
}

/** Background-prefetching poll — the reference SqsClient's async fetch
  * thread (`sqs/SqsClient.scala`: a scheduled task long-polls SQS into
  * an in-memory buffer; the Source reads the buffer), re-expressed as a
  * decorator: a daemon thread refills a buffer from the transport every
  * `intervalMs`, and consumer `poll()` drains a SNAPSHOT of the buffer
  * without paying transport latency on the trigger path. Buffered
  * entries leave on ack/deadLetter.
  *
  * Trade-offs, written down:
  *  - a consumer poll may briefly miss a just-arrived message (next
  *    refill gets it) or see a just-acked-by-another-party one
  *    (at-least-once; the source's seen-file cache dedups) — the same
  *    staleness window the reference's async fetch has;
  *  - refill failures are logged and retried at the next tick, never
  *    propagated into the consumer's trigger path;
  *  - the thread is a daemon and stops on `close()` —
  *    [[QueueFileSource]] closes its client on stream stop.
  * Default OFF: synchronous polling keeps AvailableNow runs
  * deterministic; enable via `prefetch.intervalMs` for latency-critical
  * continuous streams. Tests drive [[refill]] directly (`intervalMs`
  * huge) so behavior is clock-free.
  */
class PrefetchingQueueClient(
    underlying: QueueClient,
    intervalMs: Long) extends QueueClient with AutoCloseable {
  require(intervalMs > 0, s"prefetch interval must be > 0, got $intervalMs")

  private val buffer = new java.util.LinkedHashMap[String, FileNotification]()
  @volatile private var closed = false

  /** One transport poll into the buffer. The background thread's tick;
    * public so specs can drive refills deterministically (clock-free).
    */
  def refill(): Unit = {
    val polled =
      try underlying.poll()
      catch {
        case e: Exception =>
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"queue prefetch refill failed, retrying next tick: $e")
          return
      }
    synchronized {
      // refresh to the transport's CURRENT view: messages acked or
      // dead-lettered out-of-band must not linger in the buffer forever
      buffer.clear()
      polled.foreach(n => buffer.put(n.ackHandle, n))
    }
  }

  // sleep-then-refill: the first tick lands one interval after start
  // (intervals are seconds-scale), and a test constructing the client
  // with a huge interval gets NO background refills — it drives refill()
  // directly, keeping the spec clock-free
  private val thread = new Thread(() => {
    while (!closed) {
      try Thread.sleep(intervalMs)
      catch { case _: InterruptedException => () }
      if (!closed) refill()
    }
  }, "graft-queue-prefetch")
  thread.setDaemon(true)
  thread.start()

  override def poll(): Seq[FileNotification] = synchronized {
    import scala.jdk.CollectionConverters._
    buffer.values.asScala.toList.sortBy(n => (n.timestamp, n.path))
  }

  override def ack(handles: Seq[String]): Unit = {
    underlying.ack(handles)
    synchronized(handles.foreach(buffer.remove))
  }

  override def deadLetter(handles: Seq[String]): Unit = {
    underlying.deadLetter(handles)
    synchronized(handles.foreach(buffer.remove))
  }

  override def close(): Unit = {
    closed = true
    thread.interrupt()
    thread.join(5000)
    underlying.close()
  }
}

/** Bounded retry with linear backoff around transient transport
  * failures — the reference retried every SQS call the same way. ALL
  * three operations retry: poll is read-only, and ack/deadLetter are
  * idempotent deletes/moves, so re-running a half-applied batch is
  * safe. After `maxAttempts` the last error propagates.
  */
class RetryingQueueClient(
    underlying: QueueClient,
    maxAttempts: Int,
    backoffMs: Long,
    sleep: Long => Unit = Thread.sleep) extends QueueClient {
  require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")

  private def withRetry[T](what: String)(f: => T): T = {
    var attempt = 1
    while (true) {
      try return f
      catch {
        case e: Exception if attempt < maxAttempts =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"queue $what failed (attempt $attempt/$maxAttempts), retrying: $e")
          sleep(backoffMs * attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def poll(): Seq[FileNotification] = withRetry("poll")(underlying.poll())
  override def ack(handles: Seq[String]): Unit = withRetry("ack")(underlying.ack(handles))
  override def deadLetter(handles: Seq[String]): Unit =
    withRetry("deadLetter")(underlying.deadLetter(handles))
  override def close(): Unit = underlying.close()
}
