package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.Op
import graft.operators.Enrich

/** Streaming ingest: file source → enrichment → partitioned parquet sink
  * with checkpointed exactly-once semantics.
  *
  * Reference: `jobs/S3ToParquetStreamJob.scala:55-87` (readStream with
  * schema + maxFilesPerTrigger → withColumn enrichment → writeStream
  * parquet partitioned by (Date, Country), Append, checkpointLocation).
  *
  * Spark-first changes:
  *  - `Trigger.AvailableNow` for bounded runs (tests/backfills) instead of
  *    `awaitAnyTermination` forever;
  *  - optional watermarked `dropDuplicates` on the deterministic ingest id
  *    — the exactly-once guard whose absence caused the reference's Hudi
  *    duplicate repro (README.md:115-122);
  *  - partition column is the derived event_date: low cardinality, so the
  *    sink writes ~1 file per partition per micro-batch; at 100 TB the
  *    layout stays prune-friendly and small-file pressure is bounded by
  *    trigger rate, not key cardinality.
  */
object IngestPipeline {

  /** Raw schema of the events feed as landed (ts = int64 nanos; the
    * generator writes TIMESTAMP(NANOS) which Spark reads as long under
    * `spark.sql.legacy.parquet.nanosAsLong`).
    */
  val rawEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Normalize the raw feed: nanos → timestamp, then standard enrichment. */
  def transform(raw: DataFrame): DataFrame =
    Enrich.enrichFrame(
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))))

  /** Open the streaming source (parquet file stream, bounded files per
    * micro-batch like the reference's maxFilesPerTrigger).
    */
  def source(spark: SparkSession, path: String, maxFilesPerTrigger: Int = 4): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawEventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(path)
  }

  /** Enriched stream with the exactly-once dedup guard: drop events whose
    * deterministic ingest_id was already seen within the watermark. State
    * is bounded by the watermark horizon; the dropDuplicates shuffle keys
    * on the 128-bit id, which is uniform by construction (no skew).
    */
  def withDedup(enriched: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    enriched
      .withWatermark("ts", watermarkDelay)
      .dropDuplicates("ingest_id")

  /** Start the full pipeline; AvailableNow processes the backlog in
    * maxFilesPerTrigger-bounded batches then stops.
    */
  def start(
      spark: SparkSession,
      sourcePath: String,
      sinkPath: String,
      checkpointPath: String,
      dedup: Boolean = false,
      maxFilesPerTrigger: Int = 4): StreamingQuery = {
    val enriched = transform(source(spark, sourcePath, maxFilesPerTrigger))
    val out = if (dedup) withDedup(enriched) else enriched
    out.writeStream
      .format("parquet")
      .partitionBy("event_date")
      .option("checkpointLocation", checkpointPath)
      .option("path", sinkPath)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Driver-checkable op: run the real streaming pipeline over the events
    * parquet, then read the partitioned sink back. Deterministic columns
    * only (ingest_ts excluded); the oracle is the equivalent batch SQL.
    */
  def ingestRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val work = Files.createTempDirectory("graft-ingest").toFile.getAbsolutePath
    // File streams read landed-file DIRECTORIES (the reference's S3 prefix);
    // stage the single test file into one.
    Files.createDirectories(java.nio.file.Paths.get(s"$work/in"))
    Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$work/in/events.parquet"))
    val q = start(spark, s"$work/in", s"$work/sink", s"$work/ckpt")
    q.awaitTermination()
    spark.read.parquet(s"$work/sink")
      .select(
        col("event_id"), col("event_date"), col("event_hour"),
        col("ingest_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  val ops: Seq[Op] = Seq(
    Op("q_stream_ingest", ingestRoundTrip,
      Some("""
        SELECT event_id,
          CAST(ts AS DATE) AS event_date,
          CAST(EXTRACT(HOUR FROM ts) AS INT) AS event_hour,
          concat_ws('-',
            substr(md5(CAST(event_id AS VARCHAR)), 1, 8),
            substr(md5(CAST(event_id AS VARCHAR)), 9, 4),
            substr(md5(CAST(event_id AS VARCHAR)), 13, 4),
            substr(md5(CAST(event_id AS VARCHAR)), 17, 4),
            substr(md5(CAST(event_id AS VARCHAR)), 21, 12)) AS ingest_id,
          event_type, value
        FROM events
        ORDER BY event_id"""))
  )
}
