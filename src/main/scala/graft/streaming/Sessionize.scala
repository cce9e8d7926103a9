package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

import graft.Op
import graft.sources.Tables

/** Gap-based sessionization (sessions split when a user is idle longer
  * than `gap`), in both execution modes:
  *
  *  - BATCH: pure window functions — lag → new-session flag → running sum
  *    as session id → grouped aggregate. One shuffle on user_id; the
  *    running sum is computed within each user partition, so this scales
  *    as a single pass at 100 TB (skew bounded by the busiest user).
  *  - STREAMING: `flatMapGroupsWithState` with event-time timeout — the
  *    custom-state operator the reference never reached (its streaming
  *    jobs are stateless maps; this is capability 19 of SURVEY §2).
  *
  * Both produce identical sessions for closed sessions; the spec asserts
  * the equivalence on real data.
  */
object Sessionize {

  val DefaultGapMicros: Long = 6L * 3600 * 1000000 // 6 hours

  /** Batch sessionization via window functions. */
  def batch(events: DataFrame, gapMicros: Long = DefaultGapMicros): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_sess")).over(byUser))
      .groupBy(col("user_id"), col("sid"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
  }

  // ---- streaming (flatMapGroupsWithState) ----

  case class Ev(user_id: Long, ts: Instant, value: Double)
  case class OpenSession(startUs: Long, endUs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Instant, session_end: Instant,
      n_events: Long, sum_value: Double)

  /** Micros-exact conversions (java.sql.Timestamp.getTime would truncate
    * to millis and break equality with the batch plan).
    */
  private def micros(i: Instant): Long = i.getEpochSecond * 1000000L + i.getNano / 1000L
  private def instant(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)

  private def toSession(uid: Long, s: OpenSession): Session =
    Session(uid, instant(s.startUs), instant(s.endUs), s.n, s.sum)

  /** Per-group step: fold this batch's events (sorted by time) into the
    * open session, emitting every session that a gap closes; the still-open
    * session waits in state until the event-time timeout (watermark past
    * end+gap) flushes it.
    */
  def step(gapMicros: Long)(
      uid: Long, evs: Iterator[Ev], state: GroupState[OpenSession]): Iterator[Session] = {
    if (!state.hasTimedOut && evs.isEmpty) return Iterator.empty
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession(uid, _)).iterator
      state.remove()
      return out
    }
    // Interval merge over (state ∪ batch): treating the open session as
    // one more interval and folding in START order makes late arrivals
    // exact — an event BEFORE the open session extends it backwards when
    // within the gap, or forms its own (immediately closed) session when
    // disjoint. The previous forward-only fold merged ANY older event
    // into the open session (us - endUs is negative ⇒ always ≤ gap),
    // silently corrupting session_start for out-of-order data.
    val intervals = (state.getOption.toSeq ++
      evs.toSeq.map(e => OpenSession(micros(e.ts), micros(e.ts), 1L, e.value)))
      .sortBy(s => (s.startUs, s.endUs))
    val merged = intervals.foldLeft(List.empty[OpenSession]) { (acc, iv) =>
      acc match {
        case h :: t if iv.startUs - h.endUs <= gapMicros =>
          OpenSession(h.startUs, math.max(h.endUs, iv.endUs),
            h.n + iv.n, h.sum + iv.sum) :: t
        case _ => iv :: acc
      }
    }.reverse
    val openS = merged.last
    state.update(openS)
    state.setTimeoutTimestamp(openS.endUs / 1000 + gapMicros / 1000)
    // every earlier interval is > gap away from its successor: closed
    merged.dropRight(1).map(toSession(uid, _)).iterator
  }

  /** Streaming sessionization over a watermarked event stream. */
  def stream(events: Dataset[Ev], gapMicros: Long = DefaultGapMicros,
      watermarkDelay: String = "1 minute"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(
        step(gapMicros))
  }

  def batchOp(spark: SparkSession, dir: String): DataFrame =
    batch(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("session_start"))

  val ops: Seq[Op] = Seq(
    Op("q_sessionize", batchOp,
      Some("""
        WITH flags AS (
          SELECT user_id, ts, value,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) > 21600000000
                 THEN 1 ELSE 0 END AS new_sess
          FROM events),
        sess AS (
          SELECT user_id, ts, value,
            SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
          FROM flags)
        SELECT user_id,
          min(ts) AS session_start,
          max(ts) AS session_end,
          count(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM sess GROUP BY user_id, sid
        ORDER BY user_id, session_start"""))
  )
}
