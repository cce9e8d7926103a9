package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op

/** Watermarked stream-stream interval join — each event joined to the
  * same user's clicks from the preceding hour, both sides unbounded
  * streams.
  *
  * This is the Structured Streaming capability tier above the reference's
  * stateless map pipelines: the state store must buffer BOTH sides, and
  * the watermark + join-time bound together give Spark the eviction rule
  * (a click older than watermark − 1 h can never match again and is
  * dropped). State is O(events in the interval horizon), independent of
  * stream length.
  *
  * Scale: the join keys on user_id → one shuffle per side per
  * micro-batch; skew bounded by the busiest user within the horizon.
  */
object StreamJoin {

  /** The joined stream (streaming-safe; also valid on batch frames, which
    * is what the oracle compares against).
    */
  def intervalJoin(events: DataFrame, clicks: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour").alias("e")
      .join(
        clicks.withWatermark("cts", "2 hours").alias("c"),
        expr("""
          e.user_id = c.user_id AND
          e.ts >= c.cts AND
          e.ts < c.cts + interval 1 hour"""))
      .select(col("e.event_id"), col("c.click_event_id"))

  /** Driver-checkable round trip: run the REAL stream-stream join over
    * the staged events file (two independent file-stream sources), sink
    * to parquet, read back. Oracle = the batch interval join in SQL.
    */
  def roundTrip(spark: SparkSession, dir: String): DataFrame = {
    val work = graft.Scratch.dir("graft-ssjoin")
    def src() = IngestPipeline.source(spark, IngestPipeline.stagedEventsDir(spark, dir))
    val events = IngestPipeline.transform(src())
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = IngestPipeline.transform(src())
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_event_id"))
    // Dual-side join state = 4 stores per partition, and measured cost
    // here is ~0.5-0.8 s of FIXED per-store overhead per batch (init +
    // schema + commit) regardless of row count — total join time scales
    // with the partition count, not the data. So the partition count
    // follows the state-volume sizing rule ([[StreamTuning]]): ~12 MB of
    // horizon state at sf0.1 → the floor, not the core count. At real
    // scale the same rule yields more partitions because the state
    // volume (not the cluster) demands them.
    val q = StreamTuning.withStatePartitions(spark, 4) {
      intervalJoin(events, clicks).writeStream
        .format("parquet")
        .option("checkpointLocation", StreamTuning.scratchDir("graft-ssjoin-ckpt"))
        .option("path", s"$work/sink")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    spark.read.parquet(s"$work/sink")
      .orderBy(col("event_id"), col("click_event_id"))
  }

  val ops: Seq[Op] = Seq(
    Op("q_stream_join", roundTrip,
      Some("""
        SELECT e.event_id, c.event_id AS click_event_id
        FROM events e JOIN events c
          ON c.event_type = 'click'
         AND e.user_id = c.user_id
         AND e.ts >= c.ts
         AND e.ts < c.ts + INTERVAL 1 HOUR
        ORDER BY 1, 2"""))
  )
}
