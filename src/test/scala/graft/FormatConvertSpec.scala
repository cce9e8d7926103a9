package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.{DeltaInterop, FormatConvert, IcebergInterop}

class FormatConvertSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-convert-$tag").toFile.getAbsolutePath

  private def sample = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0))
    .toDF("id", "cat", "v")

  test("deltaToIceberg: metadata-only adoption reads identically; target stays live") {
    val base = tmp("d2i")
    DeltaInterop.write(sample, s"$base/d")
    DeltaInterop.write(sample.filter(col("id") > 2), s"$base/d") // 2 commits
    FormatConvert.deltaToIceberg(spark, s"$base/d", s"$base/i")
    val viaDelta = DeltaInterop.read(spark, s"$base/d")
      .as[(Long, String, Double)].collect().sorted.toSeq
    val viaIceberg = IcebergInterop.read(spark, s"$base/i")
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(viaIceberg == viaDelta)
    // no data was copied: the iceberg tree has metadata only
    val iceDir = new java.io.File(s"$base/i")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    assert(walk(iceDir).forall(f => !f.getName.endsWith(".parquet") ||
      f.getPath.contains("/metadata/")), "no adopted parquet under the target tree")
    // converted table is live: a native append lands and reads back
    IcebergInterop.write(Seq((9L, "c", 90.0)).toDF("id", "cat", "v"), s"$base/i")
    val after = IcebergInterop.read(spark, s"$base/i")
      .as[(Long, String, Double)].collect().toSet
    assert(after == viaDelta.toSet + ((9L, "c", 90.0)))
    // stats landed in the adopted manifest: a selective filter still prunes
    val pruned = IcebergInterop.readWhere(spark, s"$base/i", Some(col("id") === 9L))
      .as[(Long, String, Double)].collect().toSet
    assert(pruned == Set((9L, "c", 90.0)))
  }

  test("deltaToIceberg refuses a partitioned Delta source loudly") {
    val base = tmp("d2i-part")
    DeltaInterop.write(sample, s"$base/d", partitionBy = Seq("cat"))
    val e = intercept[IllegalArgumentException](
      FormatConvert.deltaToIceberg(spark, s"$base/d", s"$base/i"))
    assert(e.getMessage.contains("partitioned"))
  }

  test("icebergToDelta: adoption reads identically; vacuum never reclaims donor files") {
    val base = tmp("i2d")
    IcebergInterop.write(sample, s"$base/i")
    IcebergInterop.write(sample.filter(col("id") <= 2)
      .withColumn("v", col("v") * 10), s"$base/i")
    FormatConvert.icebergToDelta(spark, s"$base/i", s"$base/d")
    val viaIceberg = IcebergInterop.read(spark, s"$base/i")
      .as[(Long, String, Double)].collect().sorted.toSeq
    val viaDelta = DeltaInterop.read(spark, s"$base/d")
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(viaDelta == viaIceberg)
    // a native Delta append coexists with the adopted absolute-path files
    DeltaInterop.write(Seq((9L, "c", 90.0)).toDF("id", "cat", "v"), s"$base/d")
    // vacuum with zero retention must only ever touch the delta tree —
    // the donor's files are outside it by construction
    val deleted = DeltaInterop.vacuum(spark, s"$base/d", retentionMs = 0L)
    assert(deleted == 0, s"vacuum reclaimed $deleted files on a fresh converted table")
    val after = DeltaInterop.read(spark, s"$base/d")
      .as[(Long, String, Double)].collect().toSet
    assert(after == viaIceberg.toSet + ((9L, "c", 90.0)))
  }

  test("icebergToDelta converts identity-partitioned sources (files are self-contained)") {
    val base = tmp("i2d-part")
    IcebergInterop.write(sample, s"$base/i", partitionBy = Seq("cat"))
    FormatConvert.icebergToDelta(spark, s"$base/i", s"$base/d")
    val viaDelta = DeltaInterop.read(spark, s"$base/d")
      .as[(Long, String, Double)].collect().toSet
    assert(viaDelta == sample.as[(Long, String, Double)].collect().toSet)
    // the identity column arrived with real values, not nulls
    assert(viaDelta.map(_._2) == Set("a", "b"))
  }

  test("hudiToDelta / hudiToIceberg: latest slices adopted, meta columns gone, partitioned source prunes") {
    import graft.sinks.HudiInterop
    val base = tmp("h2x")
    val rows = Seq((1L, "a", 10.0, 1L), (2L, "a", 20.0, 1L),
      (3L, "b", 30.0, 1L), (4L, "b", 40.0, 1L)).toDF("id", "cat", "v", "ts")
    HudiInterop.insert(rows, s"$base/h", recordKey = "id", precombine = "ts",
      partitionBy = Seq("cat"))
    // upsert rewrites group a: conversion must adopt the LATEST slice only
    HudiInterop.upsert(Seq((2L, "a", 25.0, 2L)).toDF("id", "cat", "v", "ts"),
      s"$base/h", recordKey = "id", precombine = "ts", partitionBy = Seq("cat"))
    val expect = Set((1L, "a", 10.0, 1L), (2L, "a", 25.0, 2L),
      (3L, "b", 30.0, 1L), (4L, "b", 40.0, 1L))

    FormatConvert.hudiToDelta(spark, s"$base/h", s"$base/d")
    val viaDelta = DeltaInterop.read(spark, s"$base/d")
    assert(!viaDelta.schema.fieldNames.exists(_.startsWith("_hoodie")),
      "meta columns must not surface in the converted schema")
    assert(viaDelta.as[(Long, String, Double, Long)].collect().toSet == expect)
    // the partition column rides as a plain column; stats prune on it
    val snap = DeltaInterop.snapshot(spark, s"$base/d")
    val kept = DeltaInterop.pruneAdds(spark, snap, Some(col("cat") === "b"))
    assert(kept.size == 1, s"cat stats must prune partition a's file: $kept")

    FormatConvert.hudiToIceberg(spark, s"$base/h", s"$base/i")
    val viaIce = IcebergInterop.read(spark, s"$base/i")
    assert(!viaIce.schema.fieldNames.exists(_.startsWith("_hoodie")))
    assert(viaIce.as[(Long, String, Double, Long)].collect().toSet == expect)
    // record counts landed in the manifests (not zero)
    val (_, refs) = IcebergInterop.currentDataFiles(spark, s"$base/i")
    assert(refs.map(_.records).sum == 4L, refs.toString)
  }

  test("both driver round-trip queries match the oracle algebra on sf0.001") {
    val expected = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("p", col("o_totalprice"))
      .select(col("o_orderstatus"), col("p"))
      .unionByName(
        graft.sources.Tables.orders(spark, sf).filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderstatus"), (col("o_totalprice") * 2).as("p")))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("p").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
          .cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
      .as[(String, Long, Double)].collect().toSeq
    val ice = FormatConvert.convertToIcebergRoundTrip(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    val del = FormatConvert.convertToDeltaRoundTrip(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    assert(ice == expected)
    assert(del == expected)
  }
}
