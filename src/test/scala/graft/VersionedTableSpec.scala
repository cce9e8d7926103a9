package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.VersionedTable

class VersionedTableSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  private def table(): String =
    Files.createTempDirectory("graft-vt").toFile.getAbsolutePath + "/t"

  private def df(rows: (Long, String, Long)*) =
    rows.toDF("k", "p", "v")

  test("write/append/upsert build a version history; every snapshot stays readable") {
    val t = table()
    val v1 = VersionedTable.write(spark, t, df((1L, "a", 1L), (2L, "b", 1L)), Seq("p"))
    val v2 = VersionedTable.write(spark, t, df((3L, "a", 1L)), Seq("p"), mode = "append")
    val v3 = VersionedTable.upsert(spark, t,
      df((1L, "a", 2L)), key = "k", precombine = "v", partitionCols = Seq("p"))
    assert((v1, v2, v3) == (1L, 2L, 3L))
    assert(VersionedTable.latestVersion(spark, t) == 3L)

    def snap(v: Long) = VersionedTable.read(spark, t, asOfVersion = Some(v))
      .select("k", "v").as[(Long, Long)].collect().toSet
    assert(snap(1) == Set((1L, 1L), (2L, 1L)))
    assert(snap(2) == Set((1L, 1L), (2L, 1L), (3L, 1L)))
    assert(snap(3) == Set((1L, 2L), (2L, 1L), (3L, 1L)))
    // latest == v3
    assert(VersionedTable.read(spark, t).select("k", "v")
      .as[(Long, Long)].collect().toSet == snap(3))

    val hist = VersionedTable.history(spark, t)
      .select("version", "op").as[(Long, String)].collect().toSet
    assert(hist == Set((1L, "overwrite"), (2L, "append"), (3L, "upsert")))
  }

  test("upsert shares untouched partitions' files across versions (COW, no rewrite)") {
    val t = table()
    VersionedTable.write(spark, t, df((1L, "a", 1L), (2L, "b", 1L)), Seq("p"))
    VersionedTable.upsert(spark, t, df((1L, "a", 2L)),
      key = "k", precombine = "v", partitionCols = Seq("p"))
    val f1 = VersionedTable.read(spark, t, asOfVersion = Some(1)).inputFiles.toSet
    val f2 = VersionedTable.read(spark, t).inputFiles.toSet
    val bFiles1 = f1.filter(_.contains("p=b/"))
    assert(bFiles1.nonEmpty && bFiles1.subsetOf(f2),
      "partition b untouched by the upsert must keep its exact files")
    assert(f1.filter(_.contains("p=a/")).intersect(f2.filter(_.contains("p=a/"))).isEmpty,
      "partition a was rewritten — snapshots must not share its files")
  }

  test("overwrite is a logical remove: previous snapshot still readable until vacuum") {
    val t = table()
    VersionedTable.write(spark, t, df((1L, "a", 1L)), Seq("p"))
    VersionedTable.write(spark, t, df((9L, "a", 9L)), Seq("p"))
    assert(VersionedTable.read(spark, t).select("k").as[Long].collect().toSeq == Seq(9L))
    assert(VersionedTable.read(spark, t, asOfVersion = Some(1))
      .select("k").as[Long].collect().toSeq == Seq(1L))

    val dead = VersionedTable.vacuum(spark, t, retainVersions = 1)
    assert(dead.nonEmpty, "v1's files must be reclaimed")
    // latest still intact; the vacuumed snapshot's files are gone
    assert(VersionedTable.read(spark, t).select("k").as[Long].collect().toSeq == Seq(9L))
    assert(dead.forall(f => !new java.io.File(s"$t/$f").exists()))
  }

  test("timestamp travel resolves the last commit at or before the timestamp") {
    val t = table()
    VersionedTable.write(spark, t, df((1L, "a", 1L)), Seq("p"))
    VersionedTable.write(spark, t, df((2L, "a", 2L)), Seq("p"), mode = "append")
    val hist = VersionedTable.history(spark, t)
      .select("version", "ts_ms").as[(Long, Long)].collect().sortBy(_._1)
    val ts1 = hist.head._2
    val got = VersionedTable.read(spark, t, asOfTimestampMs = Some(ts1))
      .select("k").as[Long].collect().toSet
    // ts of v1 may equal ts of v2 on a fast box — accept either prefix snapshot
    assert(got == Set(1L) || (hist(1)._2 == ts1 && got == Set(1L, 2L)), got)
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, t, asOfTimestampMs = Some(ts1 - 1000))
    }
  }

  test("log replay uses checkpoints: 12 appends read back whole, snapshot mid-history works") {
    val t = table()
    VersionedTable.write(spark, t, df((0L, "a", 0L)), Seq("p"))
    (1 to 11).foreach(i =>
      VersionedTable.write(spark, t, df((i.toLong, "a", 0L)), Seq("p"), mode = "append"))
    assert(VersionedTable.latestVersion(spark, t) == 12L)
    assert(VersionedTable.read(spark, t).count() == 12L)
    assert(VersionedTable.read(spark, t, asOfVersion = Some(11))
      .select("k").as[Long].collect().toSet == (0L to 10L).toSet)
  }

  test("concurrent commit to the same version is rejected, log stays consistent") {
    val t = table()
    VersionedTable.write(spark, t, df((1L, "a", 1L)), Seq("p"))
    // Reserve version 2 behind the writer's back.
    val blocker = new java.io.File(s"$t/_graft_log/v${"%020d".format(2L)}.json")
    val v1 = new java.io.File(s"$t/_graft_log/v${"%020d".format(1L)}.json")
    Files.copy(v1.toPath, blocker.toPath)
    intercept[java.util.ConcurrentModificationException] {
      VersionedTable.write(spark, t, df((2L, "a", 1L)), Seq("p"), mode = "append")
    }
  }

  test("q_time_travel round trip sees the pre-upsert snapshot") {
    val out = VersionedTable.timeTravelRoundTrip(spark, sf)
    val base = graft.sources.Tables.orders(spark, sf)
    assert(out.count() == base.count())
    assert(out.select(max(col("version"))).as[Long].head() == 1L,
      "AS OF v1 must not see version-2 rows")
  }
}
