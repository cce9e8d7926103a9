package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Op
import graft.sources.Tables

/** Windowed event aggregation: tumbling-window counts/sums per event type.
  *
  * The same `window()` + agg plan serves both engines of execution: in a
  * batch frame it is an ordinary grouped aggregation; on a stream (with
  * `withWatermark`) Structured Streaming maintains it incrementally and
  * emits windows as the watermark closes them. The reference only ran
  * batch verification counts after the fact (`jobs/S3ParquetBatchReader
  * .scala`); this makes the rollup itself incremental.
  *
  * Scale: partial aggregation happens map-side per micro-batch; state per
  * (window × type) is O(windows_in_horizon × |types|), independent of
  * event volume. Sums use DECIMAL so merge order never changes results.
  */
object EventRollup {

  private val Money = DecimalType(18, 4)

  /** The shared aggregation plan over any window spec (batch or stream). */
  private def rollupBy(events: DataFrame, w: org.apache.spark.sql.Column): DataFrame =
    events
      .groupBy(w.as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(Money)).cast("double").as("sum_value"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  def rollup(events: DataFrame): DataFrame =
    rollupBy(events, window(col("ts"), "1 hour"))

  /** Streaming variant: watermarked, append-mode-ready. */
  def rollupStream(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    rollup(events.withWatermark("ts", watermarkDelay))

  def batch(spark: SparkSession, dir: String): DataFrame =
    rollup(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  /** Sliding-window variant: 1-hour windows every 30 minutes, so each
    * event lands in exactly two windows. Streaming-incremental like the
    * tumbling form (state = windows-in-horizon × types); the oracle
    * explodes each event into its two window starts.
    */
  def slidingRollup(events: DataFrame): DataFrame =
    rollupBy(events, window(col("ts"), "1 hour", "30 minutes"))

  def slidingBatch(spark: SparkSession, dir: String): DataFrame =
    slidingRollup(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  /** Native session windows (`session_window`, 30-minute gap): the same
    * gap-merge the streaming engine runs with watermarked state, planned
    * here in batch so the result is DuckDB-checkable via the classic
    * islands construction. Spark merges TOUCHING event windows — two
    * events exactly one gap apart share a session (verified against
    * 4.1.2) — so the islands break is STRICTLY greater than the gap,
    * matching [[Sessionize]]'s batch oracle; `session_end` = last
    * event + gap. Complements the flatMapGroupsWithState formulation:
    * same problem, the declarative engine-native spelling.
    */
  def nativeSessions(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(Money)).cast("double").as("total_value"))
      .select(
        col("user_id"),
        col("sw.start").as("session_start"),
        col("sw.end").as("session_end"),
        col("n_events"), col("total_value"))

  def nativeSessionsBatch(spark: SparkSession, dir: String): DataFrame =
    nativeSessions(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("session_start"))

  val ops: Seq[Op] = Seq(
    Op("q_session_native", nativeSessionsBatch,
      Some("""
        WITH marked AS (
          SELECT user_id, ts, value,
            CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
                 THEN 1 ELSE 0 END AS brk
          FROM events),
        sess AS (
          SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked)
        SELECT user_id,
          min(ts) AS session_start,
          max(ts) + INTERVAL 30 MINUTE AS session_end,
          count(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        FROM sess GROUP BY user_id, sid
        ORDER BY user_id, session_start""")),
    Op("q_stream_window", batch,
      Some("""
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type""")),
    Op("q_stream_window_sliding", slidingBatch,
      Some("""
        SELECT window_start, event_type,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM (
          SELECT unnest([wf, wf - INTERVAL 30 MINUTE]) AS window_start,
                 event_type, value
          FROM (
            SELECT date_trunc('hour', ts) + CASE WHEN EXTRACT(MINUTE FROM ts) >= 30
                     THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS wf,
                   event_type, value
            FROM events))
        GROUP BY 1, 2
        ORDER BY window_start, event_type"""))
  )
}
