package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Loaders for the engine's table layout: one parquet dataset per table
  * under a scale-factor directory.
  *
  * Reads are plain `spark.read.parquet` so Catalyst keeps full pushdown /
  * pruning ability: every operator downstream should show its filters in
  * `PushedFilters` and its projection in `ReadSchema` when explained.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Session-scoped CATALOG of table schemas. A pathless
    * `spark.read.parquet` re-infers the schema on every DataFrame
    * construction — a footer-probe Spark job per table read (~70 ms
    * measured here; at cloud-storage latencies far worse), paid by every
    * query over a fixed table layout. Real deployments resolve schemas
    * from a catalog (HMS/Glue) exactly once; this map is that catalog
    * for the directory layout. Metadata only — every query still scans
    * and computes from the parquet files themselves — and entries die
    * with the session (keyed by it, so planted test dirs and scale
    * factors never collide).
    */
  private val schemaCatalog =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table: $name")
    val p = path(dir, name)
    val schema = schemaCatalog.computeIfAbsent((spark, p),
      _ => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(p)
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` has shipped in two physical shapes across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark can only read as
    * int64 under `nanosAsLong`) and plain timestamp[us] (read as
    * TIMESTAMP_NTZ). Load, then normalize whatever arrived via
    * [[normalizeTs]] — hard-coding either shape breaks the moment the
    * generator changes, and a drift then surfaces as dozens of scattered
    * DATATYPE_MISMATCH failures instead of one loud loader error.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, d, "events"), "events")
  }

  /** Normalize a `ts` column to session-zoned TimestampType at microsecond
    * precision, whatever physical shape the file carried:
    *  - int64 (TIMESTAMP(NANOS) under `nanosAsLong`): floor nanos → micros;
    *  - TIMESTAMP_NTZ (timestamp[us], isAdjustedToUTC=false): cast — the
    *    session timezone is pinned to UTC ([[graft.GraftSession]]), so the
    *    cast is value-identical and every downstream operator (watermarks,
    *    windows, unix_micros, date_format) sees the one type the whole
    *    engine is verified against;
    *  - TimestampType: already normalized.
    * Any other dtype fails loudly, naming the table.
    */
  def normalizeTs(df: DataFrame, tableName: String): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", F.col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"$tableName.ts loaded as unsupported dtype $other — " +
          "expected int64 nanos, TIMESTAMP_NTZ, or TIMESTAMP; the testdata " +
          "generator's physical encoding changed and normalizeTs needs a case for it")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register every table of a scale dir as a temp view so the whole
    * engine is reachable from `spark.sql` (including graft's native
    * functions once registered — see `GraftFunctions`).
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach { name =>
      val df = name match {
        case "events" => events(spark, dir)
        case _ => table(spark, dir, name)
      }
      df.createOrReplaceTempView(name)
    }

  /** Ensure a frame headed into CPU-heavy per-row compute (signatures,
    * hashes) uses every core: small local tables arrive as ONE parquet
    * split, which would serialize an interpreted-expression stage. At
    * production scale inputs come in thousands of splits and this is a
    * no-op; the round-robin shuffle is only paid when the scan is narrower
    * than the cluster.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Decide from the INPUT FILE COUNT, not df.rdd.getNumPartitions: the
    // rdd probe forces full physical planning of the frame per call just
    // to read a number. File count is resolved from the logical plan's
    // file index (already in memory after analysis); it under-counts
    // when large files split, which only means a redundant-but-harmless
    // round-robin shuffle. Non-file frames (inputFiles empty — planted
    // in-memory test data) take the repartition: they are exactly the
    // narrow local inputs this guard exists for.
    val nFiles = df.inputFiles.length
    if (nFiles >= target) df else df.repartition(target)
  }
}
