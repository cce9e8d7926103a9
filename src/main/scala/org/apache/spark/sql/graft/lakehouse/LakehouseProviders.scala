package org.apache.spark.sql.graft.lakehouse

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.FilterColumns
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, Filter, PrunedFilteredScan, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.sinks.{DeltaInterop, HudiInterop, IcebergInterop}

/** The native lakehouse wire-format engines behind Spark's STANDARD
  * datasource API: `spark.read.format("graft-delta" | "graft-hudi" |
  * "graft-iceberg").option("path", …)` and the matching
  * `df.write.format(…).mode(…)` — the call shape of the reference's
  * `S3{Delta,Hudi,Iceberg}BatchReader` / stream-job writers
  * (S3DeltaBatchReader.scala, S3HudiBatchReader.scala,
  * S3IcebergBatchReader.scala) with only the format name swapped, and
  * no connector jar anywhere.
  *
  * Read path: V1 pushed-down filters translate into ONE predicate for
  * each engine's `readWhere`, so Delta `add.stats` skipping, Iceberg
  * manifest bounds + partition-record pruning, and Hudi slice
  * resolution all fire through the standard API BEFORE a scan task is
  * planned; every filter is reported unhandled, so Spark re-applies
  * them exactly — pruning stays a pure optimization.
  *
  * Options — read: `versionAsOf` (delta), `snapshotId` (iceberg),
  * `asOfInstant` / `beginInstant` incremental pull (hudi). Write:
  * `partitionBy` (comma-separated; delta + iceberg), `mergeSchema`
  * (delta), `recordKey`/`precombine` (hudi, required — routes
  * insert-or-upsert on table existence with combine-before-insert).
  */
abstract class GraftLakehouseProvider(format: String) extends DataSourceRegister
    with RelationProvider with CreatableRelationProvider with StreamSinkProvider {

  override def shortName(): String = s"graft-$format"

  /** `writeStream.format("graft-delta" | "graft-hudi" | "graft-iceberg")`
    * — the reference stream jobs' exact sink call shape
    * (`S3ToDeltaStreamJob.scala`, `S3ToHudiOptStreamJob.scala:80-105`,
    * `S3ToIcebergStreamJob.scala`) with only the format name swapped.
    * Each micro-batch is one wire-format commit with the same
    * exactly-once discipline as [[graft.sinks.TableSink.streamBatch]]:
    * delta stamps the protocol's txn action and iceberg a `graft.txn`
    * property (replayed batches are no-ops), hudi replays are IDEMPOTENT
    * (keyed precombine upsert converges when a batch re-lands). Hudi
    * needs `recordKey` + `precombine` options; `writeStream.partitionBy`
    * (or option("partitionBy")) becomes the table's partition layout.
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      s"graft-$format sink needs option(\"path\", …)"))
    require(outputMode == OutputMode.Append() || outputMode == OutputMode.Update(),
      s"graft-$format sink supports Append/Update output modes, got: $outputMode")
    val partitionBy =
      if (partitionColumns.nonEmpty) partitionColumns
      else parameters.get("partitionBy").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val cfg = graft.sinks.TableSink.SinkConfig(
      format = format, path = path, partitionBy = partitionBy,
      tableName = parameters.get("tableName"),
      upsertKey = parameters.get("recordKey"),
      precombine = parameters.get("precombine"))
    if (format == "hudi") { // fail at sink construction, not first batch
      require(cfg.upsertKey.isDefined,
        "graft-hudi sink needs option(\"recordKey\", …)")
      require(cfg.precombine.isDefined,
        "graft-hudi sink needs option(\"precombine\", …)")
    }
    new LakehouseStreamSink(cfg, parameters)
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    new LakehouseRelation(sqlContext, format, parameters)

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      s"graft-$format write needs option(\"path\", …)"))
    val spark = data.sparkSession
    val partitionBy = parameters.get("partitionBy").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val exists = LakehouseRelation.tableExists(spark, format, path)
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(s"graft-$format table already exists: $path")
      case SaveMode.Ignore if exists => // no-op per SaveMode contract
        return createRelation(sqlContext, parameters)
      case _ => ()
    }
    val overwrite = mode == SaveMode.Overwrite
    format match {
      case "delta" =>
        DeltaInterop.write(data, path, partitionBy, overwrite = overwrite,
          mergeSchema = parameters.get("mergeSchema").exists(_.toBoolean))
        ()
      case "hudi" =>
        val key = parameters.getOrElse("recordKey",
          throw new IllegalArgumentException(
            "graft-hudi write needs option(\"recordKey\", …)"))
        val pre = parameters.getOrElse("precombine",
          throw new IllegalArgumentException(
            "graft-hudi write needs option(\"precombine\", …)"))
        require(!overwrite,
          "graft-hudi: Overwrite is not supported — Hudi tables evolve by " +
            "keyed upsert (use SaveMode.Append)")
        val name = parameters.getOrElse("tableName", "graft_table")
        val combined = HudiInterop.precombineBatch(data, key, pre)
        if (exists) HudiInterop.upsert(combined, path, key, pre, partitionBy, name)
        else HudiInterop.insert(combined, path, key, pre, partitionBy, name)
        ()
      case "iceberg" =>
        IcebergInterop.write(data, path, overwrite = overwrite,
          partitionBy = partitionBy)
        ()
    }
    createRelation(sqlContext, parameters)
  }
}

/** Streaming SINK into a native wire-format table: re-wraps each
  * micro-batch's executed RDD as a batch frame (the V1 file-sink move —
  * the foreachBatch bodies run batch actions) and hands it to
  * [[graft.sinks.TableSink.streamBatch]]. The txn appId defaults to the
  * FULL checkpoint location: stable across restarts of the same query,
  * unique per query (a truncated hash could collide and make a new
  * query's early batches replay-skip — silent data loss).
  */
private[lakehouse] class LakehouseStreamSink(
    cfg: graft.sinks.TableSink.SinkConfig,
    params: Map[String, String]) extends Sink {

  private val appId = params.getOrElse("appId",
    s"graft-${cfg.format}@" + params("checkpointLocation"))
  private val body = graft.sinks.TableSink.streamBatch(cfg, appId)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = data.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]].queryExecution
    val batch = spark.internalCreateDataFrame(qe.toRdd, data.schema, isStreaming = false)
    body(batch, batchId)
  }

  override def toString: String = s"LakehouseStreamSink[graft-${cfg.format}, ${cfg.path}]"
}

/** Delta additionally streams: `spark.readStream.format("graft-delta")`
  * tails the log's `dataChange = true` appends — offsets ARE versions,
  * so recovery is exactly-once with no source state beyond the
  * checkpointed offset, and [[graft.sinks.DeltaInterop.compact]]'s
  * maintenance commits re-emit nothing. `startingVersion` replays from
  * a version (inclusive); the default horizon is the table's latest
  * version at FIRST stream start, persisted in the checkpoint.
  */
class GraftDeltaProvider extends GraftLakehouseProvider("delta")
    with StreamSourceProvider {

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta source needs option(\"path\", …)"))
    val spark = sqlContext.sparkSession.asInstanceOf[SparkSession]
    val base = schema.getOrElse(DeltaInterop.snapshot(spark, path).schema)
    // option("readChangeFeed","true"): the tail emits CHANGES (delta's
    // own streaming-CDF spelling) — data columns + the three CDF columns
    val out =
      if (!parameters.get("readChangeFeed").exists(_.toBoolean)) base
      else StructType(base.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("_commit_timestamp",
          org.apache.spark.sql.types.TimestampType)))
    (shortName(), out)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession.asInstanceOf[SparkSession]
    new DeltaTailSource(spark, parameters,
      sourceSchema(sqlContext, schema, providerName, parameters)._2, metadataPath)
  }
}
/** Hudi additionally streams: the tail is the INCREMENTAL-PULL contract
  * — offsets are timeline instants (17-digit numerics, so they ride a
  * LongOffset), each micro-batch emits the row versions committed in
  * the instant window, and upsert rewrites re-emit only the UPDATED
  * rows (carried-over rows keep their original commit time and drop
  * out). Default horizon = latest instant at first start.
  */
class GraftHudiProvider extends GraftLakehouseProvider("hudi")
    with StreamSourceProvider {

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-hudi source needs option(\"path\", …)"))
    val spark = sqlContext.sparkSession.asInstanceOf[SparkSession]
    (shortName(), schema.getOrElse(HudiInterop.read(spark, path).schema))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession.asInstanceOf[SparkSession]
    new HudiTailSource(spark, parameters,
      sourceSchema(sqlContext, schema, providerName, parameters)._2, metadataPath)
  }
}

/** Iceberg additionally streams: offsets are snapshot DEPTHS (ancestor
  * count — monotonic where snapshot ids are random), each micro-batch
  * emits the files ADDED by the snapshots in the window via the parent
  * chain. Compaction (`replace`) snapshots emit nothing; `overwrite`
  * fails the tail loudly unless `ignoreChanges`.
  */
class GraftIcebergProvider extends GraftLakehouseProvider("iceberg")
    with StreamSourceProvider {

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-iceberg source needs option(\"path\", …)"))
    val spark = sqlContext.sparkSession.asInstanceOf[SparkSession]
    (shortName(), schema.getOrElse(IcebergInterop.read(spark, path).schema))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession.asInstanceOf[SparkSession]
    new IcebergTailSource(spark, parameters,
      sourceSchema(sqlContext, schema, providerName, parameters)._2, metadataPath)
  }
}

/** Streaming SOURCE over a Hudi table's incremental pull. */
private[graft] class HudiTailSource(
    spark: SparkSession,
    options: Map[String, String],
    override val schema: StructType,
    metadataPath: String) extends Source {

  private val tablePath = options("path")

  private def latestInstant: Long =
    HudiInterop.completedInstants(spark, tablePath)
      .lastOption.map(_.toLong).getOrElse(0L)

  // horizon H = emit instants > H; beginInstant replays from just after
  // it; default = latest at FIRST start, persisted in the checkpoint
  private val startInstant: Long =
    org.apache.spark.sql.graft.SourceHelpers.persistedStartVersion(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], metadataPath,
      options.get("beginInstant").map(_.toLong).getOrElse(latestInstant))

  override def getOffset: Option[Offset] = {
    val latest = latestInstant
    if (latest > startInstant) Some(LongOffset(latest)) else None
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    def asLong(o: Offset): Long = o match {
      case LongOffset(v) => v
      case other => other.json.toLong
    }
    val from = start.map(asLong).getOrElse(startInstant)
    val to = asLong(end)
    val batch =
      if (to <= from)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else HudiInterop.readIncrementalBetween(spark, tablePath,
        f"$from%017d", f"$to%017d")
    org.apache.spark.sql.graft.SourceHelpers.asStreamingFrame(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      batch.select(schema.fieldNames.toIndexedSeq.map(col): _*))
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Streaming SOURCE over an Iceberg table's snapshot chain. */
private[graft] class IcebergTailSource(
    spark: SparkSession,
    options: Map[String, String],
    override val schema: StructType,
    metadataPath: String) extends Source {

  private val tablePath = options("path")
  private val ignoreChanges = options.get("ignoreChanges").exists(_.toBoolean)

  /** (depth, snapshot-id) of the current head: depth = ancestor count,
    * the tail's monotonic clock.
    */
  private def head: Option[(Long, Long)] =
    IcebergInterop.snapshotChain(spark, tablePath)
      .map(chain => (chain.size.toLong, chain.last))

  private val startDepth: Long =
    org.apache.spark.sql.graft.SourceHelpers.persistedStartVersion(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], metadataPath,
      if (options.get("startingSnapshot").contains("earliest")) 0L
      else head.map(_._1).getOrElse(0L))

  override def getOffset: Option[Offset] = head match {
    case Some((depth, _)) if depth > startDepth => Some(LongOffset(depth))
    case _ => None
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    def asLong(o: Offset): Long = o match {
      case LongOffset(v) => v
      case other => other.json.toLong
    }
    val from = start.map(asLong).getOrElse(startDepth)
    val to = asLong(end)
    val chain = IcebergInterop.snapshotChain(spark, tablePath).getOrElse(Nil)
    // a shrunken chain means expiry rewrote history past the checkpoint —
    // silent empty batches would wedge the stream; fail loudly instead
    require(chain.size >= to,
      s"graft-iceberg tail: checkpointed offset $to is beyond the table's " +
        s"surviving snapshot chain (${chain.size}) — snapshots were expired; " +
        "restart from a fresh checkpoint")
    // depth offsets are only meaningful against ONE history: a rollback
    // rewrites the ancestor chain, so the same depths now name different
    // snapshots and a tail would silently skip the post-rollback commits.
    // The committed head marker ((depth, id) of the last batch served)
    // detects the rewrite and fails the stream loudly.
    org.apache.spark.sql.graft.SourceHelpers.readMarker(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      metadataPath, "graft-iceberg-head").foreach { m =>
      val Array(d, id) = m.split(":", 2)
      require(chain.size >= d.toInt && chain(d.toInt - 1) == id.toLong,
        s"graft-iceberg tail: the snapshot at checkpointed depth $d is no " +
          s"longer $id — table history was rewritten (rollback_to_snapshot?); " +
          "restart from a fresh checkpoint")
    }
    val batch =
      if (to <= from)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else IcebergInterop.appendsBetween(spark, tablePath,
        fromSnapshot = if (from == 0L) None else Some(chain(from.toInt - 1)),
        toSnapshot = chain(to.toInt - 1), ignoreChanges)
    if (to > 0 && to <= chain.size)
      org.apache.spark.sql.graft.SourceHelpers.writeMarker(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        metadataPath, "graft-iceberg-head", s"$to:${chain(to.toInt - 1)}")
    org.apache.spark.sql.graft.SourceHelpers.asStreamingFrame(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      batch.select(schema.fieldNames.toIndexedSeq.map(col): _*))
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

/** Streaming SOURCE tailing a Delta wire-format table's appends. */
private[graft] class DeltaTailSource(
    spark: SparkSession,
    options: Map[String, String],
    override val schema: StructType,
    metadataPath: String) extends Source {

  private val tablePath = options("path")
  private val ignoreChanges = options.get("ignoreChanges").exists(_.toBoolean)
  private val readCdf = options.get("readChangeFeed").exists(_.toBoolean)

  // horizon H = emit commits > H; startingVersion=v replays from v
  // inclusive (Delta's option semantics); default = latest at FIRST
  // start, persisted so restarts keep the horizon
  private val startVersion: Long =
    org.apache.spark.sql.graft.SourceHelpers.persistedStartVersion(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], metadataPath,
      options.get("startingVersion").map(_.toLong - 1)
        .getOrElse(DeltaInterop.latestVersion(spark, tablePath)))

  override def getOffset: Option[Offset] = {
    val latest = DeltaInterop.latestVersion(spark, tablePath)
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
      if (to <= from)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else if (readCdf)
        DeltaInterop.readChangeFeed(spark, tablePath, from, to)
      else DeltaInterop.appendsBetween(spark, tablePath, from, to, ignoreChanges)
    org.apache.spark.sql.graft.SourceHelpers.asStreamingFrame(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      batch.select(schema.fieldNames.toIndexedSeq.map(col): _*))
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

private[graft] object LakehouseRelation {
  def tableExists(spark: SparkSession, format: String, path: String): Boolean =
    format match {
      case "delta" => DeltaInterop.latestVersion(spark, path) >= 0
      case "hudi" => HudiInterop.completedInstants(spark, path).nonEmpty
      case "iceberg" =>
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.exists(new org.apache.hadoop.fs.Path(s"$path/metadata/version-hint.text"))
    }
}

/** Batch relation over one wire-format table. Filters push into the
  * engine's metadata pruning; all are reported unhandled so Spark
  * re-applies them exactly on the survivors.
  */
private[graft] class LakehouseRelation(
    override val sqlContext: SQLContext,
    format: String,
    params: Map[String, String]) extends BaseRelation with PrunedFilteredScan {

  private val spark = sqlContext.sparkSession.asInstanceOf[SparkSession]
  private val path = params.getOrElse("path", throw new IllegalArgumentException(
    s"graft-$format read needs option(\"path\", …)"))

  private def planned(where: Option[Column]): DataFrame = format match {
    case _ if params.contains("metadataTable") =>
      // inspection tables: tiny, metadata-only, filters re-applied
      val base = format match {
        case "delta" => DeltaInterop.metadataTable(spark, path,
          params("metadataTable"))
        case "hudi" => HudiInterop.metadataTable(spark, path,
          params("metadataTable"))
        case "iceberg" => IcebergInterop.metadataTable(spark, path,
          params("metadataTable"))
      }
      where.map(base.filter).getOrElse(base)
    case "delta" =>
      DeltaInterop.readWhere(spark, path, where,
        versionAsOf = params.get("versionAsOf").map(_.toLong))
    case "hudi" =>
      val base = params.get("beginInstant") match {
        case Some(since) => HudiInterop.readIncremental(spark, path, since)
        case None => HudiInterop.read(spark, path,
          asOf = params.get("asOfInstant"))
      }
      where.map(base.filter).getOrElse(base)
    case "iceberg" =>
      // option("ref", "audit"): read AS OF a named branch/tag head
      val asOf = params.get("ref") match {
        case Some(name) => Some(IcebergInterop.refs(spark, path).getOrElse(name,
          throw new IllegalArgumentException(
            s"graft-iceberg: no ref '$name' at $path"))._1)
        case None => params.get("snapshotId").map(_.toLong)
      }
      IcebergInterop.readWhere(spark, path, where, snapshotId = asOf)
  }

  override val schema: StructType = planned(None).schema

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  // table bytes from the format's OWN metadata (add.size / write stats /
  // manifest file_size_in_bytes — zero data IO): without the override
  // BaseRelation reports defaultSizeInBytes and a lakehouse join side
  // never auto-broadcasts, however small the table
  override val sizeInBytes: Long = format match {
    case "delta" => DeltaInterop.liveBytes(spark, path,
      params.get("versionAsOf").map(_.toLong))
    case "hudi" => HudiInterop.liveBytes(spark, path)
    case "iceberg" => IcebergInterop.liveBytes(spark, path,
      params.get("snapshotId").map(_.toLong))
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val pred = filters.flatMap(FilterColumns.toColumn(_)).reduceOption(_ && _)
    planned(pred).select(requiredColumns.toIndexedSeq.map(col): _*).rdd
  }

  override def toString: String = s"LakehouseRelation[graft-$format, $path]"
}
