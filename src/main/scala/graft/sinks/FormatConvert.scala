package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Op

/** Metadata-only CONVERSION between the lakehouse wire formats — the
  * migration path every production lakehouse eventually needs (Iceberg
  * ships it as the `snapshot`/`migrate` procedures, Delta as `CONVERT
  * TO DELTA`): adopt an existing table's DATA FILES into the other
  * format's metadata without copying a byte. The donor's parquet stays
  * where it is; the target format gets a fresh metadata tree whose
  * first commit references those files by absolute path, with column
  * stats recomputed in one distributed pass so file skipping works in
  * the target immediately.
  *
  * Ownership contract (both directions): the DONOR format keeps
  * owning the shared files' lifecycle. The converted table is fully
  * live in the target format — reads, appends, DML, compaction all
  * work — but target-side physical cleanup can never reclaim donor
  * files ([[DeltaInterop.vacuum]] walks only its own tree; Iceberg
  * snapshot expiry deletes only files its own metadata introduced).
  * Running destructive maintenance on the DONOR after converting
  * breaks the target, exactly as it does for the real procedures —
  * convert-then-retire is the supported pattern.
  *
  * Scale: conversion cost is one metadata write + one stats pass over
  * the adopted files (a scan, embarrassingly parallel); it never
  * shuffles and never rewrites data. A 100 TB migration is minutes of
  * stats scan, not a copy.
  *
  * The reference runs Delta, Hudi and Iceberg sinks side by side over
  * the same feed (`jobs/S3ToDeltaStreamJob.scala`,
  * `S3ToIcebergStreamJob.scala`); conversion is how such a deployment
  * consolidates formats without a historical backfill.
  */
object FormatConvert {

  /** CONVERT TO ICEBERG: adopt a Delta table's current snapshot as a
    * fresh Iceberg table. Unpartitioned Delta tables only — Delta's
    * hive layout physically STRIPS partition columns from the data
    * files, so a metadata-only adoption cannot produce self-contained
    * Iceberg data files for a partitioned source (rewrite through
    * [[IcebergInterop.write]] instead; refusing loudly beats silently
    * reading nulls).
    */
  def deltaToIceberg(spark: SparkSession, deltaPath: String,
      icebergPath: String): Long = {
    val snap = DeltaInterop.snapshot(spark, deltaPath)
    require(snap.metaData.partitionColumns.isEmpty,
      "deltaToIceberg: partitioned Delta sources are not metadata-convertible " +
        "(hive layout strips partition columns from data files) — rewrite via " +
        "IcebergInterop.write instead")
    val withCounts = snap.adds.map { a =>
      val abs = DeltaInterop.resolveAddPath(deltaPath, a.path)
      val records = a.stats.flatMap(parseNumRecords)
      (abs, a.size, records)
    }
    // foreign logs may omit add.stats — count the stragglers in ONE job
    val missing = withCounts.collect { case (p, _, None) => p }
    val counted: Map[String, Long] =
      if (missing.isEmpty) Map.empty
      else spark.read.parquet(missing: _*)
        .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
        .collect().map(r => FileStats.canon(r.getString(0)) -> r.getLong(1))
        .toMap
    val refs = withCounts.map { case (p, size, rec) =>
      IcebergInterop.DataFileRef(p,
        rec.orElse(counted.get(FileStats.canon(p))).getOrElse(0L), size)
    }
    IcebergInterop.commitExternal(spark, icebergPath, snap.schema, refs)
  }

  /** CONVERT TO DELTA: adopt an Iceberg table's current snapshot as a
    * fresh Delta table. Identity-partitioned Iceberg sources convert
    * fine — graft's Iceberg writer keeps identity source columns
    * physically in the data files (the real-writer layout), so every
    * adopted file is self-contained; the converted Delta table is
    * unpartitioned (partition-pruning re-derives from `add.stats`,
    * which carry the identity columns' min=max bounds).
    */
  def icebergToDelta(spark: SparkSession, icebergPath: String,
      deltaPath: String): Long = {
    val (schema, refs) = IcebergInterop.currentDataFiles(spark, icebergPath)
    DeltaInterop.commitExternal(spark, deltaPath, schema,
      refs.map(r => (r.path, r.bytes)))
  }

  private def parseNumRecords(stats: String): Option[Long] =
    try {
      import org.json4s._
      implicit val formats: Formats = DefaultFormats
      (org.json4s.jackson.JsonMethods.parse(stats) \ "numRecords").extractOpt[Long]
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Driver-checked CONVERT TO ICEBERG round trip: orders land as a
    * Delta table, convert metadata-only, then a derived slice APPENDS
    * through the Iceberg writer — proving the converted table is live
    * in the target format, not a frozen export — and the read-back
    * aggregate covers both the adopted and the native files. The
    * DuckDB oracle replays the same algebra over raw orders parquet;
    * the two metadata layers must be invisible to results.
    */
  def convertToIcebergRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.Scratch.dir("graft-convert-ice")
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    DeltaInterop.write(orders, s"$base/orders_delta")
    deltaToIceberg(spark, s"$base/orders_delta", s"$base/orders_iceberg")
    IcebergInterop.write(
      orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2),
      s"$base/orders_iceberg")
    IcebergInterop.read(spark, s"$base/orders_iceberg")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(38, 6))).cast("double")
          .as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Driver-checked CONVERT TO DELTA round trip — the mirror image:
    * orders land as an Iceberg table, convert metadata-only, a derived
    * slice appends through the Delta writer, and the read-back
    * aggregate covers adopted + native files through the Delta log.
    */
  def convertToDeltaRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.Scratch.dir("graft-convert-delta")
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    IcebergInterop.write(orders, s"$base/orders_iceberg")
    icebergToDelta(spark, s"$base/orders_iceberg", s"$base/orders_delta")
    DeltaInterop.write(
      orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2),
      s"$base/orders_delta")
    DeltaInterop.read(spark, s"$base/orders_delta")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast(DecimalType(38, 6))).cast("double")
          .as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  private val ConvertOracle = """
    WITH staged AS (
      SELECT o_orderstatus, o_totalprice FROM orders
      UNION ALL
      SELECT o_orderstatus, o_totalprice * 2 FROM orders
      WHERE o_orderkey % 10 = 0)
    SELECT o_orderstatus, count(*) AS n_rows,
           cast(sum(cast(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
    FROM staged GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  val ops: Seq[Op] = Seq(
    Op("q_convert_to_iceberg", convertToIcebergRoundTrip, Some(ConvertOracle)),
    Op("q_convert_to_delta", convertToDeltaRoundTrip, Some(ConvertOracle)))
}
