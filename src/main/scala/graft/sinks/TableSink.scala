package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Pluggable table sink: one config surface for parquet / delta / hudi /
  * iceberg, batch or streaming.
  *
  * Re-expresses the sink surface of the reference's four writer jobs
  * (`jobs/S3ToParquetStreamJob.scala:76-86`, `S3ToDeltaStreamJob.scala`,
  * `S3ToHudiOptStreamJob.scala:80-105` — recordkey/precombine/table
  * options, `S3ToIcebergStreamJob.scala`) as ONE declarative config
  * instead of four copy-pasted jobs.
  *
  * Only the parquet engine is executable in this container (the lakehouse
  * jars are not on the offline classpath); the other three formats are
  * config-mapped — `options(cfg)` produces exactly the writer options each
  * format needs, unit-tested, so dropping the jar on the classpath is the
  * only step left to light them up.
  *
  * Scale: `partitionBy` should be LOW-CARDINALITY derived columns (date,
  * category). Hive-style layout keeps reads prune-friendly; pruning is
  * asserted by spec via the scan's PartitionFilters.
  */
object TableSink {

  final case class SinkConfig(
      format: String,                       // parquet | delta | hudi | iceberg
      path: String,
      partitionBy: Seq[String] = Seq.empty,
      mode: String = "append",              // batch save mode / stream output mode
      tableName: Option[String] = None,     // hudi/iceberg table identity
      upsertKey: Option[String] = None,     // hudi recordkey / merge key
      precombine: Option[String] = None)    // hudi precombine (latest-wins) field

  val SupportedFormats: Set[String] = Set("parquet", "delta", "hudi", "iceberg")

  /** Format-specific writer options (pure mapping, no side effects). */
  def options(cfg: SinkConfig): Map[String, String] = cfg.format match {
    case "hudi" =>
      // Option keys per Apache Hudi's Spark datasource docs.
      Map(
        "hoodie.table.name" -> cfg.tableName.getOrElse("graft_table"),
        "hoodie.datasource.write.operation" ->
          (if (cfg.upsertKey.isDefined) "upsert" else "bulk_insert"),
        "hoodie.datasource.write.partitionpath.field" -> cfg.partitionBy.mkString(",")) ++
        cfg.upsertKey.map("hoodie.datasource.write.recordkey.field" -> _) ++
        cfg.precombine.map("hoodie.datasource.write.precombine.field" -> _)
    case "iceberg" =>
      cfg.tableName.map("path" -> _).toMap
    case _ =>
      Map.empty // batch save(path) / stream option("path") carry the path
  }

  private def requireSupported(cfg: SinkConfig): Unit = {
    require(SupportedFormats.contains(cfg.format), s"unknown sink format: ${cfg.format}")
    if (cfg.format != "parquet") {
      val cls = cfg.format match {
        case "delta" => "org.apache.spark.sql.delta.sources.DeltaDataSource"
        case "hudi" => "org.apache.hudi.DefaultSource"
        case "iceberg" => "org.apache.iceberg.spark.source.IcebergSource"
      }
      require(
        try { Class.forName(cls); true } catch { case _: ClassNotFoundException => false },
        s"sink format '${cfg.format}' needs its connector jar on the classpath ($cls)")
    }
  }

  /** Batch write through the config surface. */
  def writeBatch(df: DataFrame, cfg: SinkConfig): Unit = {
    requireSupported(cfg)
    df.write
      .format(cfg.format)
      .options(options(cfg))
      .partitionBy(cfg.partitionBy: _*)
      .mode(cfg.mode)
      .save(cfg.path)
  }

  /** Streaming writer through the same config surface (caller starts it
    * with its checkpoint location).
    */
  def streamWriter[T](w: DataStreamWriter[T], cfg: SinkConfig, checkpoint: String): DataStreamWriter[T] = {
    requireSupported(cfg)
    w.format(cfg.format)
      .options(options(cfg))
      .option("path", cfg.path)
      .partitionBy(cfg.partitionBy: _*)
      .option("checkpointLocation", checkpoint)
      .outputMode(cfg.mode)
  }

  /** Read a partitioned table back (partition columns come from the
    * hive-style directory layout; filters on them prune directories, not
    * files — spec-asserted).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Subscribe to a parquet table as a stream: every file that lands in
    * the table after the checkpoint is processed exactly once
    * (`jobs/S3ParquetStreamReader.scala:58-70` tails the parquet sink the
    * same way). Explicit schema keeps the stream start O(1) instead of a
    * full listing+infer.
    */
  def readStream(
      spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .format("parquet")
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(path)

  /** Compact a partitioned parquet table in place: streaming ingest with
    * small triggers leaves one file per partition per micro-batch (the
    * small-file problem the reference's README wrestles with across its
    * sink formats); rewrite each hive partition into
    * ceil(bytes / targetFileBytes) files.
    *
    * The rewrite repartitions BY THE PARTITION COLUMNS so each output
    * task owns whole partitions (one shuffle, no cross-partition merge),
    * then `maxRecordsPerFile` splits oversized partitions. Rewrite goes
    * to a temp dir first and is swapped in only after success — a crash
    * mid-compact leaves the original table intact.
    */
  def compact(
      spark: SparkSession, path: String,
      partitionCols: Seq[String], targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact-tmp")
    val bak = new org.apache.hadoop.fs.Path(path + ".compact-old")
    // Recover from a prior crash before touching anything: a leftover
    // backup with no live table means the crash hit between the two
    // renames — restore it; stale tmp/backup alongside a live table are
    // abandoned rewrites — drop them so the renames below can't no-op.
    if (fs.exists(bak) && !fs.exists(dst)) {
      require(fs.rename(bak, dst), s"compact: failed to restore $bak -> $dst")
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(bak)) fs.delete(bak, true)

    val df = read(spark, path)
    val totalBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val rows = df.count()
    val avgRow = if (rows == 0) 1L else (totalBytes / rows).toLong.max(1L)
    val recordsPerFile = (targetFileBytes / avgRow).max(1L)
    df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", recordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(tmp.toString)
    require(fs.rename(dst, bak), s"compact: failed to move $dst aside to $bak")
    if (!fs.rename(tmp, dst)) {
      // Put the original back so a failed swap never leaves no table.
      fs.rename(bak, dst)
      throw new java.io.IOException(s"compact: failed to swap $tmp into $dst")
    }
    require(fs.exists(dst), s"compact: $dst missing after swap")
    fs.delete(bak, true)
  }
}
