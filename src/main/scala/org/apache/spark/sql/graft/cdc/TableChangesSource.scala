package org.apache.spark.sql.graft.cdc

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming change-data-capture over a [[graft.sinks.VersionedTable]]:
  * `format("graft-table-changes")` follows the table's transaction log
  * and emits each commit's ROW-LEVEL changes (insert/update/delete +
  * `_change_type`, `_commit_version`) as a micro-batch — the streaming
  * side of Delta's readChangeFeed, built on the same V1 `Source` SPI as
  * the queue source.
  *
  * Offsets ARE table versions: the log is immutable and the row-diff is
  * deterministic, so recovery recomputes exactly the same batch from the
  * same (start, end] version range — exactly-once without any source
  * state beyond the checkpointed offset. ([[graft.sinks.VersionedTable
  * .vacuum]] limits how far back a crashed stream can replay, the same
  * trade Delta CDF makes.)
  *
  * Scale: each micro-batch reads only the commit's file churn (the CDF
  * prune in `changes`), never the table; a quiet table costs one log
  * listing per trigger.
  *
  * Options: `table.path` (required), `key` (required — row identity),
  * `partitionCols` (comma-separated, '' ok), `startingVersion`
  * (default: the table's latest version at stream start — new commits
  * only; pass 0 to replay the full history as one initial batch).
  * Schema is fixed at stream start (mid-stream schema evolution →
  * restart the stream).
  */
class TableChangesSource(
    sparkSession: SparkSession,
    options: Map[String, String],
    override val schema: StructType,
    metadataPath: String)
  extends Source {

  import TableChangesSource._

  private val tablePath = options.getOrElse("table.path",
    throw new IllegalArgumentException("option 'table.path' is required"))
  private val key = options.getOrElse("key",
    throw new IllegalArgumentException("option 'key' is required"))
  private val partitionCols = options.get("partitionCols")
    .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
  private val includePreimage = options.get("includePreimage").exists(_.toBoolean)

  /** The stream's start version, PERSISTED in the checkpoint on first
    * construction: the "latest at stream start" default is only
    * meaningful at first start — recomputing it on restart would make a
    * replayed getBatch(None, end) see an empty (or wrong) version range
    * and wedge the checkpoint. Same pattern as FileStreamSource's
    * metadata log.
    */
  private val startVersion: Long =
    org.apache.spark.sql.graft.SourceHelpers.persistedStartVersion(
      sparkSession, metadataPath,
      options.get("startingVersion").map(_.toLong)
        .getOrElse(graft.sinks.VersionedTable.latestVersion(sparkSession, tablePath)))

  override def getOffset: Option[Offset] = {
    val latest = graft.sinks.VersionedTable.latestVersion(sparkSession, tablePath)
    if (latest > startVersion) Some(LongOffset(latest)) else None
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(asLong).getOrElse(startVersion)
    val to = asLong(end)
    val cols = schema.fields.map(f => col(f.name)).toSeq
    val batch =
      if (to <= from) // defensive: an empty replay range is an empty batch
        sparkSession.createDataFrame(
          sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else (from + 1 to to).map { v =>
        graft.sinks.VersionedTable
          .changes(sparkSession, tablePath, v - 1, v, key, partitionCols, includePreimage)
          .withColumn("_commit_version", lit(v))
          .select(cols: _*)
      }.reduce(_ unionByName _)
    // the diff must be PLANNED as batch (streaming-tagged leaves would
    // give the full-outer diff join streaming semantics) — see
    // SourceHelpers.asStreamingFrame
    org.apache.spark.sql.graft.SourceHelpers.asStreamingFrame(sparkSession, batch)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"TableChangesSource[$tablePath]"
}

object TableChangesSource {
  private def asLong(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.toLong
  }

  /** CDC schema = table schema + change metadata columns. */
  def changesSchema(spark: SparkSession, path: String): StructType = {
    val base = graft.sinks.VersionedTable.tableSchema(spark, path)
    StructType(base.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
  }
}

/** Registers `format("graft-table-changes")`. */
class TableChangesSourceProvider extends DataSourceRegister with StreamSourceProvider {

  override def shortName(): String = "graft-table-changes"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = parameters.getOrElse("table.path",
      throw new IllegalArgumentException("option 'table.path' is required"))
    (shortName(), schema.getOrElse(TableChangesSource.changesSchema(
      sqlContext.sparkSession.asInstanceOf[SparkSession], path)))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession.asInstanceOf[SparkSession]
    new TableChangesSource(spark, parameters,
      schema.getOrElse(TableChangesSource.changesSchema(
        spark, parameters("table.path"))), metadataPath)
  }
}
