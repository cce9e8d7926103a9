package org.apache.spark.sql.graft.table

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SQLContext}
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, Filter, PrunedFilteredScan, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

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
class GraftTableSinkProvider extends DataSourceRegister
    with StreamSinkProvider with StreamSourceProvider
    with RelationProvider with CreatableRelationProvider {

  override def shortName(): String = "graft-table"

  // ---- batch read: spark.read.format("graft-table").option("path", …)
  //      [.option("versionAsOf"/"timestampAsOf", …)] ----

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    require(parameters.contains("path"), "graft-table: option 'path' is required")
    new GraftTableRelation(sqlContext, parameters)
  }

  // ---- batch write: df.write.format("graft-table").option("path", …)
  //      .mode(append|overwrite)[.option("key"/"precombine")] ----

  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    require(parameters.contains("path"), "graft-table: option 'path' is required")
    require(parameters.contains("key") == parameters.contains("precombine"),
      "graft-table: options 'key' and 'precombine' come together")
    require(!parameters.get("mergeOnRead").exists(_.toBoolean) ||
      parameters.contains("key"),
      "graft-table: 'mergeOnRead' requires 'key'/'precombine'")
    val spark = sqlContext.sparkSession.asInstanceOf[SparkSession]
    val path = parameters("path")
    // df.write.partitionBy(...) reaches V1 providers as the JSON-encoded
    // __partition_columns option — honor it (or the explicit option)
    val partitionCols = parameters
      .get(org.apache.spark.sql.execution.datasources.DataSourceUtils.PARTITIONING_COLUMNS_KEY)
      .map(org.apache.spark.sql.execution.datasources.DataSourceUtils.decodePartitioningColumns)
      .orElse(parameters.get("partitionCols")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
      .getOrElse(Nil)
    (parameters.get("key"), parameters.get("precombine")) match {
      case (Some(k), Some(pc)) =>
        require(mode == SaveMode.Append,
          "graft-table keyed writes are upserts — use SaveMode.Append")
        if (parameters.get("mergeOnRead").exists(_.toBoolean))
          graft.sinks.VersionedTable.upsertMOR(spark, path, data, k, pc, partitionCols)
        else
          graft.sinks.VersionedTable.upsert(spark, path, data, k, pc, partitionCols)
      case _ =>
        val m = mode match {
          case SaveMode.Append => "append"
          case SaveMode.Overwrite => "overwrite"
          case other => throw new IllegalArgumentException(
            s"graft-table: unsupported save mode $other")
        }
        graft.sinks.VersionedTable.write(spark, path, data, partitionCols, mode = m)
    }
    new GraftTableRelation(sqlContext, parameters - "key" - "precombine")
  }

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
    // Complete mode would append the FULL result every trigger (silent
    // duplicates); Update without a key has the same problem. Delta makes
    // the same restriction.
    require(outputMode == OutputMode.Append() ||
      (outputMode == OutputMode.Update() && parameters.contains("key")),
      s"graft-table sink: unsupported output mode $outputMode " +
        "(Append, or Update with key/precombine)")
    // exactly-once rides (appId, batchId) txn tokens: the appId must be a
    // durable per-query identity, not a truncated hash
    require(parameters.contains("appId") || parameters.contains("checkpointLocation"),
      "graft-table sink: set option 'checkpointLocation' (or an explicit 'appId')")
    new GraftTableSink(parameters, partitionColumns)
  }

  // ---- readStream side: tail the table's appends (Delta streaming
  // source shape; offsets ARE versions, so recovery is exactly-once
  // with no source state beyond the checkpointed offset) ----

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(parameters.contains("path"), "graft-table source: option 'path' is required")
    val s = schema.getOrElse(graft.sinks.VersionedTable.tableSchema(
      sqlContext.sparkSession.asInstanceOf[SparkSession], parameters("path")))
    (shortName(), s)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession.asInstanceOf[SparkSession]
    new GraftTableTailSource(spark, parameters,
      sourceSchema(sqlContext, schema, providerName, parameters)._2, metadataPath)
  }
}

/** Batch relation over a versioned table: `spark.read.format("graft-table")`
  * with `versionAsOf` / `timestampAsOf` time travel. Filters push down
  * into [[graft.sinks.VersionedTable.readPruned]], so the log's per-file
  * stats, blooms, and hidden-partition dir pruning all fire through the
  * standard read API before a single file opens; Spark re-applies the
  * filters exactly on the survivors.
  */
private[graft] class GraftTableRelation(
    override val sqlContext: SQLContext,
    params: Map[String, String]) extends BaseRelation with PrunedFilteredScan {

  private val spark = sqlContext.sparkSession.asInstanceOf[SparkSession]
  private val path = params("path")
  private val asOfVersion: Option[Long] = params.get("versionAsOf").map(_.toLong)
    .orElse(params.get("timestampAsOf").map { ts =>
      // resolve the timestamp to a version driver-side (log-only)
      graft.sinks.VersionedTable.versionAt(spark, path,
        java.sql.Timestamp.valueOf(ts).getTime)
    })

  // log-only schema resolution: no snapshot planning, works on EMPTY
  // snapshots (e.g. a table whose rows were all deleted)
  override val schema: StructType =
    graft.sinks.VersionedTable.tableSchema(spark, path, asOfVersion)

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  // live bytes from the log + one listStatus per live dir: without this,
  // BaseRelation reports defaultSizeInBytes (effectively infinite) and a
  // catalog-table join side NEVER auto-broadcasts — a tiny dimension
  // table would shuffle the fact side at any scale
  override val sizeInBytes: Long =
    graft.sinks.VersionedTable.liveBytes(spark, path, asOfVersion)

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    // translate the pushed-down source filters into ONE Column predicate
    // for readPruned; untranslatable nodes drop out conservatively (the
    // relation reports every filter unhandled, so Spark re-applies all)
    val pred = filters.flatMap(org.apache.spark.sql.graft.FilterColumns.toColumn(_))
      .reduceOption(_ && _).getOrElse(lit(true))
    val (df, _, _) = graft.sinks.VersionedTable.readPruned(spark, path, pred, asOfVersion)
    df.select(requiredColumns.toIndexedSeq.map(col): _*).rdd
  }

  // Value equality on the snapshot identity (path + pinned version +
  // schema): two resolutions of the same table are the SAME plan, so
  // CacheManager lookups hit across statements and recacheByPlan (the
  // DML commands' cache refresh) finds cached reads to re-execute.
  override def equals(o: Any): Boolean = o match {
    case r: GraftTableRelation =>
      r.path == path && r.asOfVersion == asOfVersion && r.schema == schema
    case _ => false
  }

  override def hashCode(): Int = java.util.Objects.hash(path, asOfVersion)

  override def toString: String = s"GraftTableRelation[$path]"
}

/** Streaming SOURCE over a versioned table: each micro-batch is the rows
  * APPENDED by the commits in (lastOffset, latest] — base appends and MOR
  * delta upserts (the Hudi incremental-pull contract). Non-append commits
  * (rewrites) fail the stream unless `ignoreChanges=true`; see
  * [[graft.sinks.VersionedTable.appendsBetween]]. `startingVersion`
  * defaults to the table's latest version at FIRST start (new commits
  * only; 0 replays the full table), persisted in the checkpoint so
  * restarts keep the same horizon.
  */
private[table] class GraftTableTailSource(
    spark: SparkSession,
    options: Map[String, String],
    override val schema: StructType,
    metadataPath: String) extends Source {

  private val tablePath = options("path")
  private val ignoreChanges = options.get("ignoreChanges").exists(_.toBoolean)

  // Persist the start version in the checkpoint on first construction:
  // recomputing "latest at start" on restart would shift the horizon
  // under a replayed getBatch.
  private val startVersion: Long =
    org.apache.spark.sql.graft.SourceHelpers.persistedStartVersion(
      spark, metadataPath,
      options.get("startingVersion").map(_.toLong)
        .getOrElse(graft.sinks.VersionedTable.latestVersion(spark, tablePath)))

  override def getOffset: Option[Offset] = {
    val latest = graft.sinks.VersionedTable.latestVersion(spark, tablePath)
    if (latest > startVersion) Some(LongOffset(latest)) else None
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    def asLong(o: Offset): Long = o match {
      case LongOffset(v) => v
      case other => other.json.toLong
    }
    val from = start.map(asLong).getOrElse(startVersion)
    val to = asLong(end)
    val batch =
      if (to <= from) // defensive: an empty replay range is an empty batch
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else graft.sinks.VersionedTable
        .appendsBetween(spark, tablePath, from, to, ignoreChanges)
    // Pin every batch to the DECLARED source schema (fixed at stream
    // start): a replayed batch planned before an additive evolution
    // null-fills the new columns instead of failing the stream's
    // output-schema assertion.
    val aligned = schema.fields.foldLeft(batch) { (d, f) =>
      if (d.columns.contains(f.name)) d
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(schema.fieldNames.toIndexedSeq.map(col): _*)
    org.apache.spark.sql.graft.SourceHelpers.asStreamingFrame(spark, aligned)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftTableTailSource[$tablePath]"
}

private[table] class GraftTableSink(
    params: Map[String, String],
    partitionCols: Seq[String]) extends Sink {

  private val path = params("path")
  // The txn appId must be STABLE across restarts of the same query and
  // UNIQUE per query — the FULL checkpoint location is both (a truncated
  // hash could collide across queries, and a colliding appId makes a new
  // query's early batches replay-skip: silent data loss).
  private val appId = params.getOrElse("appId",
    "graft-table@" + params("checkpointLocation"))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // The incoming frame carries the STREAMING logical plan — it cannot
    // be re-planned through batch actions (isEmpty, staged writes).
    // Re-wrap the executed micro-batch RDD as a plain batch frame, the
    // same move Spark's V1 file sink makes.
    val spark = data.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = data.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution
    val batch = spark.internalCreateDataFrame(qe.toRdd, data.schema, isStreaming = false)
    graft.GraftSession.withMicroBatchDml(batch)(runBatch(batch, batchId))
  }

  private def runBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // Persist for the duration of the commit: the upsert path runs
    // SEVERAL actions over the batch (emptiness probe, affected-partition
    // probe, staged write), and without a cache each one re-executes the
    // whole micro-batch lineage (source scan + transforms). One
    // materialization per batch is the per-commit constant we can
    // actually control; micro-batches are bounded by the trigger's
    // admission control, so the cache is bounded too. (Delta's streaming
    // sink materializes per-batch the same way.)
    batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
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
    } finally batch.unpersist(blocking = false)
  }

  override def toString: String = s"GraftTableSink[$path]"
}
