package graft.sinks

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Stats-map keying: stats drive pruning, and a wrong key silently
  * drops matching rows — so the keys must survive basename collisions
  * (hive partition dirs, donor files from arbitrary commits) and the
  * URI-vs-plain-path spelling split between `input_file_name()` and
  * caller paths.
  */
class FileStatsSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  test("canon unifies URI and plain spellings, keeps bucket authority") {
    assert(FileStats.canon("/plain/path/x.parquet") == "/plain/path/x.parquet")
    assert(FileStats.canon("file:///tmp/d/x.parquet") == "/tmp/d/x.parquet")
    assert(FileStats.canon("file:/tmp/d/x.parquet") == "/tmp/d/x.parquet")
    assert(FileStats.canon("file:///tmp/a%20b/x.parquet") == "/tmp/a b/x.parquet")
    // absolute object-store URI keeps scheme AND authority: two buckets
    // with the same key must not collide
    assert(FileStats.canon("s3://bucket/key/x.parquet") == "s3://bucket/key/x.parquet")
    assert(FileStats.canon("s3://bucket/k%3Dv/x.parquet") == "s3://bucket/k=v/x.parquet")
    assert(FileStats.canon("s3://other/key/x.parquet") != FileStats.canon("s3://bucket/key/x.parquet"))
  }

  test("collect keys by full path: basename collisions get their own stats") {
    val dir = Files.createTempDirectory("graft-filestats").toFile.getAbsolutePath
    def plant(sub: String, ids: Seq[Long]): String = {
      val tmp = s"$dir/stage-$sub"
      ids.toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.createDirectories(Paths.get(s"$dir/$sub"))
      // force the SAME basename in both dirs — the collision case a
      // hive-partitioned single-task write produces naturally
      val dst = Paths.get(s"$dir/$sub/part-00000-fixed.parquet")
      Files.move(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toString
    }
    val fa = plant("cat=a", Seq(1L, 2L, 3L))
    val fb = plant("cat=b", Seq(100L, 200L))
    val schema = StructType(Seq(StructField("id", LongType)))
    val stats = FileStats.collect(spark, Seq(fa, fb), schema)
    assert(stats.size == 2, s"one entry per file, got ${stats.keySet}")
    val sa = stats(FileStats.canon(fa))
    val sb = stats(FileStats.canon(fb))
    assert(sa.numRecords.contains(3L) && sb.numRecords.contains(2L))
    assert(sa.cols("id").min.contains(1L) && sa.cols("id").max.contains(3L))
    assert(sb.cols("id").min.contains(100L) && sb.cols("id").max.contains(200L))
  }

  test("resolveAddPath keeps scheme and authority of absolute URIs") {
    // the protocol's absolute-URI add form: stripping to the URI path
    // would read /key off the LOCAL filesystem instead of the bucket
    assert(DeltaInterop.resolveAddPath("/tbl", "s3://bucket/dir/x.parquet") ==
      "s3://bucket/dir/x.parquet")
    assert(DeltaInterop.resolveAddPath("/tbl", "s3://bucket/a%20b/x.parquet") ==
      "s3://bucket/a b/x.parquet")
    // local URI forms collapse to plain absolute paths
    assert(DeltaInterop.resolveAddPath("/tbl", "file:///tmp/d/x.parquet") ==
      "/tmp/d/x.parquet")
    // relative adds resolve against the table root, percent-decoded
    assert(DeltaInterop.resolveAddPath("/tbl", "cat=a/part-0.parquet") ==
      "/tbl/cat=a/part-0.parquet")
    assert(DeltaInterop.resolveAddPath("/tbl", "cat%3Da/part-0.parquet") ==
      "/tbl/cat=a/part-0.parquet")
  }

  test("fromFooters equals the distributed scan across the type battery") {
    val spark = ss
    val dir = Files.createTempDirectory("graft-footer-stats").toString
    val schema = StructType(Seq(
      StructField("i8", ByteType), StructField("i16", ShortType),
      StructField("i32", IntegerType), StructField("i64", LongType),
      StructField("f32", FloatType), StructField("f64", DoubleType),
      StructField("s", StringType), StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("dec_small", DecimalType(9, 2)),   // parquet INT32/64
      StructField("dec_big", DecimalType(38, 6)),    // parquet FIXED/BINARY
      StructField("all_null", StringType),
      StructField("some_null", LongType)))
    val rows = (1 to 500).map { i =>
      org.apache.spark.sql.Row(
        (i % 100).toByte, (i * 3).toShort, i * 7, i.toLong * 1000003L,
        i / 7.0f, i / 13.0d,
        if (i % 11 == 0) null else s"str-${"%04d".format(i)}",
        java.sql.Date.valueOf(s"2024-01-${1 + i % 28}"),
        java.sql.Timestamp.valueOf(s"2024-02-0${1 + i % 9} 03:04:05.12345"),
        BigDecimal(i * 37, 2).bigDecimal,
        BigDecimal(i.toLong * 982451653L, 6).bigDecimal,
        null,
        if (i % 3 == 0) null else i.toLong)
    }
    // two row groups per file: tiny block size forces a mid-file split,
    // exercising the cross-block merge
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.option("parquet.block.size", (64 * 1024).toString)
      .mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    assert(files.size >= 2)
    val scanned = FileStats.collect(spark, files, schema)
    val footers = FileStats.fromFooters(spark, files, schema)
    assert(footers.keySet == scanned.keySet)
    scanned.foreach { case (k, sStat) =>
      val fStat = footers(k)
      assert(fStat.numRecords == sStat.numRecords, s"numRecords of $k")
      sStat.cols.foreach { case (c, sc) =>
        val fc = fStat.cols(c)
        def show(v: Option[Any]) = v.map(x => s"${x.getClass.getSimpleName}:$x")
        assert(show(fc.min) == show(sc.min), s"min of $c in $k")
        assert(show(fc.max) == show(sc.max), s"max of $c in $k")
        assert(fc.nullCount == sc.nullCount, s"nullCount of $c in $k")
        assert(fc.allNull == sc.allNull, s"allNull of $c in $k")
      }
    }
  }
}
