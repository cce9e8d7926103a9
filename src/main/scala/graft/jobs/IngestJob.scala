package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.GraftSession
import graft.streaming.IngestPipeline

/** Conf-driven streaming-ingest entrypoint — the reference's job shape
  * (`jobs/S3ToParquetStreamJob.scala`, `S3SQSToParquetStreamJob.scala`:
  * a main that reads its source/sink/trigger config from an env-scoped
  * config block and runs one pipeline forever) over graft's pipeline
  * pieces. One thin main instead of one main per permutation: the config
  * block picks the source transport, sink flavor, and trigger.
  *
  * Usage: `runMain graft.jobs.IngestJob <conf.properties> [jobName]`
  * (jobName defaults to `ingest`; ENVIRONMENT selects the env block).
  *
  * Recognized keys (within `<env>.<jobName>.`):
  *  - `source.kind`    files | queue            (default files)
  *  - `source.path`    landing dir (files) — required for files
  *  - `source.format`  parquet | csv | json     (default parquet)
  *  - `queue.dir`      notification dir — required for queue
  *  - `maxFilesPerTrigger`, `visibilityTimeoutMs`, `maxReceiveCount`,
  *    `retry.attempts`, `retry.backoffMs` — admission/queue tuning
  *  - `dedup`          true → watermarked ingest_id dedup guard
  *  - `sink.kind`      parquet | graft-table | delta | hudi | iceberg
  *                      (default parquet; the lakehouse kinds stream
  *                      through the native wire-format engines)
  *  - `sink.path`, `checkpointLocation` — required
  *  - `sink.partitionBy` comma list             (default event_date)
  *  - `key`/`precombine` — graft-table keyed upsert mode
  *  - `trigger`        availableNow | processingTime:<ms> (default availableNow)
  *  - `stop.file`, `stop.pollMs` — graceful-drain marker path for
  *    long-running jobs (see [[awaitShutdown]]); SIGTERM always drains
  *
  * The feed is expected in the events-feed shape ([[IngestPipeline
  * .rawEventSchema]]); `transform` normalizes whatever ts encoding
  * arrives and applies the standard enrichment.
  */
object IngestJob {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IngestJob <conf.properties> [jobName]")
    val conf = JobConfig.load(args(0), if (args.length > 1) args(1) else "ingest")
    val spark = GraftSession.local(
      Runtime.getRuntime.availableProcessors(), s"graft-${conf.job}-${conf.env}")
    spark.sparkContext.setLogLevel(conf.getOrElse("loggerLevel", "WARN"))
    try {
      val q = start(spark, conf)
      awaitShutdown(q, conf)
    } finally spark.stop()
  }

  /** Per-format reader options, shared by BOTH transports so the same
    * feed parses identically whether it arrives by directory listing or
    * by queue notification — a csv feed carries a header row either way
    * (the queue source forwards its full option map to the per-file
    * reader, so these compose with the queue tuning options).
    */
  private[jobs] def formatOptions(format: String): Map[String, String] =
    format match {
      case "csv" => Map("header" -> "true")
      case _ => Map.empty
    }

  /** Structured shutdown for long-running (`processingTime`) jobs — the
    * operability piece a forever-`awaitTermination` main lacks: the only
    * ways to end it are SIGKILL (in-flight batch torn down; recovery is
    * correct but pays log replay) or stream error.
    *
    *  - A JVM shutdown hook stops the query on SIGTERM/SIGINT: the
    *    current micro-batch completes and commits, THEN the query stops —
    *    the next run resumes from a clean checkpoint with no replay.
    *  - `stop.file` (optional config): poll for a marker file and stop
    *    the query gracefully when it appears — the drain signal for
    *    orchestrators that can touch a path but not signal the JVM.
    *
    * AvailableNow jobs terminate on their own; both mechanisms are
    * harmless there. Factored from main so specs can drive it.
    */
  private[graft] def awaitShutdown(
      q: org.apache.spark.sql.streaming.StreamingQuery,
      conf: JobConfig): Unit = {
    val hook = new Thread(() => if (q.isActive) q.stop(), s"graft-stop-${conf.job}")
    Runtime.getRuntime.addShutdownHook(hook)
    try {
      conf.get("stop.file") match {
        case None => q.awaitTermination()
        case Some(marker) =>
          val pollMs = conf.getInt("stop.pollMs", 500).toLong
          val path = java.nio.file.Paths.get(marker)
          while (!q.awaitTermination(pollMs)) {
            if (java.nio.file.Files.exists(path)) q.stop()
          }
      }
    } finally {
      try Runtime.getRuntime.removeShutdownHook(hook)
      catch { case _: IllegalStateException => () } // already shutting down
    }
  }

  /** Build and start the configured pipeline; factored from main so
    * specs (and embedders) can run it on their own session.
    */
  def start(spark: SparkSession, conf: JobConfig): org.apache.spark.sql.streaming.StreamingQuery = {
    val maxFiles = conf.getInt("maxFilesPerTrigger", 4)
    val raw: DataFrame = conf.getOrElse("source.kind", "files") match {
      case "files" =>
        val fmt = conf.getOrElse("source.format", "parquet")
        IngestPipeline.source(spark, conf("source.path"),
          IngestPipeline.FileSourceConfig(
            schema = IngestPipeline.rawEventSchema,
            format = fmt,
            options = formatOptions(fmt),
            maxFilesPerTrigger = maxFiles))
      case "queue" =>
        val fmt = conf.getOrElse("source.format", "parquet")
        spark.readStream
          .format("graft-queue")
          .schema(IngestPipeline.rawEventSchema)
          .option("queue.dir", conf("queue.dir"))
          .option("fileFormat", fmt)
          .options(formatOptions(fmt))
          .option("maxFilesPerTrigger", maxFiles.toString)
          .options(Seq("visibilityTimeoutMs", "maxReceiveCount",
            "retry.attempts", "retry.backoffMs", "prefetch.intervalMs")
            .flatMap(k => conf.get(k).map(k -> _)).toMap)
          .load()
      case other => throw new IllegalArgumentException(
        s"source.kind must be files|queue, got '$other'")
    }
    val enriched = IngestPipeline.transform(raw)
    val out =
      if (conf.getOrElse("dedup", "false").toBoolean)
        IngestPipeline.withDedup(enriched,
          conf.getOrElse("dedupWatermark", "1 hour"))
      else enriched
    val partitionBy = conf.getOrElse("sink.partitionBy", "event_date")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    // micro-batch ProcessingTime, spelled with Spark's own term — NOT
    // Spark's continuous-processing mode, which has different
    // checkpointing semantics and would deserve its own keyword
    val trigger = conf.getOrElse("trigger", "availableNow") match {
      case "availableNow" => Trigger.AvailableNow()
      case t if t.startsWith("processingTime:") =>
        Trigger.ProcessingTime(t.stripPrefix("processingTime:").toLong)
      case other => throw new IllegalArgumentException(
        s"trigger must be availableNow|processingTime:<ms>, got '$other'")
    }
    conf.getOrElse("sink.kind", "parquet") match {
      case "parquet" =>
        // IngestPipeline.startSink is the one spelling of the parquet
        // sink shape (incl. the empty-partitionBy guard and the
        // per-directory-parallel repartition)
        IngestPipeline.startSink(out, conf("sink.path"),
          conf("checkpointLocation"), partitionBy, trigger)
      case "graft-table" =>
        val w = out.writeStream.format("graft-table")
          .option("path", conf("sink.path"))
          .option("checkpointLocation", conf("checkpointLocation"))
          .trigger(trigger)
        val keyed = (conf.get("key"), conf.get("precombine")) match {
          case (Some(k), Some(pc)) => w.option("key", k).option("precombine", pc)
          case (None, None) => w
          case _ => throw new IllegalArgumentException(
            "graft-table sink: 'key' and 'precombine' come together")
        }
        (if (partitionBy.nonEmpty) keyed.partitionBy(partitionBy: _*) else keyed).start()
      case lake @ ("delta" | "hudi" | "iceberg") =>
        // the reference's S3[SQS]To{Delta,Hudi,Iceberg}StreamJob rows,
        // conf-selected: stream through the native wire-format engines
        // via TableSink.streamBatch (exactly-once per format — see its
        // Scaladoc), appId derived from the checkpoint so restarts
        // replay as no-ops
        val cfg = graft.sinks.TableSink.SinkConfig(
          format = lake, path = conf("sink.path"), partitionBy = partitionBy,
          tableName = conf.get("tableName"),
          upsertKey = conf.get("key"), precombine = conf.get("precombine"))
        val appId = "graft-ingest-" + java.util.UUID.nameUUIDFromBytes(
          conf("checkpointLocation").getBytes("UTF-8"))
        out.writeStream
          .foreachBatch(graft.sinks.TableSink.streamBatch(cfg, appId))
          .option("checkpointLocation", conf("checkpointLocation"))
          .trigger(trigger)
          .start()
      case other => throw new IllegalArgumentException(
        s"sink.kind must be parquet|graft-table|delta|hudi|iceberg, got '$other'")
    }
  }
}
