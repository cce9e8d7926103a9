package org.apache.spark.sql.graft.table

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

/** Declarative streaming sink for the versioned table — the format-string
  * shape the reference uses for its Delta/Hudi streaming sinks
  * (`jobs/S3ToDeltaStreamJob.scala`, `S3ToHudiOptStreamJob.scala:80-105`:
  * `.writeStream.format("hudi").option(RECORDKEY_FIELD, ...)`), on the
  * graft transaction log:
  *
  * {{{
  * df.writeStream.format("graft-table")
  *   .option("path", dir)
  *   .option("key", "id").option("precombine", "ts")   // upsert mode
  *   .option("mergeOnRead", "true")                    // MOR deltas
  *   .option("checkpointLocation", ckpt)
  *   .start()
  * }}}
  *
  * Per micro-batch: with `key`+`precombine` the batch is an exactly-once
  * keyed upsert (COW, or MOR delta append with `mergeOnRead`); without,
  * an exactly-once plain append. Every commit carries an (appId, batchId)
  * txn token — appId derived from the checkpoint location when not given,
  * so it is stable across restarts and replayed batches commit nothing.
  * Empty batches are no-ops. This is [[graft.sinks.VersionedTable.streamWriter]]
  * re-expressed on the `StreamSinkProvider` SPI so it composes with any
  * `writeStream` pipeline by format name.
  */
class GraftTableSinkProvider extends DataSourceRegister with StreamSinkProvider {

  override def shortName(): String = "graft-table"

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(parameters.contains("path"), "graft-table sink: option 'path' is required")
    require(parameters.contains("key") == parameters.contains("precombine"),
      "graft-table sink: options 'key' and 'precombine' come together")
    require(!parameters.get("mergeOnRead").exists(_.toBoolean) ||
      parameters.contains("key"),
      "graft-table sink: 'mergeOnRead' requires 'key'/'precombine'")
    new GraftTableSink(parameters, partitionColumns)
  }
}

private[table] class GraftTableSink(
    params: Map[String, String],
    partitionCols: Seq[String]) extends Sink {

  private val path = params("path")
  // The txn appId must be STABLE across restarts of the same query —
  // derive it from the checkpoint location (the query's durable identity)
  // unless given explicitly.
  private val appId = params.getOrElse("appId",
    "graft-table-" + Integer.toHexString(
      params.getOrElse("checkpointLocation", path).hashCode))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // The incoming frame carries the STREAMING logical plan — it cannot
    // be re-planned through batch actions (isEmpty, staged writes).
    // Re-wrap the executed micro-batch RDD as a plain batch frame, the
    // same move Spark's V1 file sink makes.
    val spark = data.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = data.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution
    val batch = spark.internalCreateDataFrame(qe.toRdd, data.schema, isStreaming = false)
    if (batch.isEmpty) return
    val txn = Some((appId, batchId))
    (params.get("key"), params.get("precombine")) match {
      case (Some(k), Some(pc)) if params.get("mergeOnRead").exists(_.toBoolean) =>
        graft.sinks.VersionedTable.upsertMOR(
          spark, path, batch, k, pc, partitionCols, txn = txn)
      case (Some(k), Some(pc)) =>
        graft.sinks.VersionedTable.upsert(
          spark, path, batch, k, pc, partitionCols, txn = txn)
      case _ =>
        graft.sinks.VersionedTable.write(
          spark, path, batch, partitionCols, mode = "append", txn = txn)
    }
    ()
  }

  override def toString: String = s"GraftTableSink[$path]"
}
