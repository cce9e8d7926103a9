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

  val ops: Seq[Op] = Seq(
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
