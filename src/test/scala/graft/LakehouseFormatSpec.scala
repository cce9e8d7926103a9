package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.sinks.{DeltaInterop, HudiInterop, IcebergInterop}

/** The wire-format engines through Spark's STANDARD datasource API —
  * the reference's batch reader/writer call shape with only the format
  * name swapped (S3DeltaBatchReader.scala:40-52 etc.).
  */
class LakehouseFormatSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-lf-$tag").toFile.getAbsolutePath + "/t"

  private def sample = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
    .toDF("id", "cat", "v")

  test("graft-delta: write/read by format name, SaveMode contract, time travel") {
    val path = tmp("delta")
    sample.write.format("graft-delta").option("path", path)
      .option("partitionBy", "cat").save()
    val back = spark.read.format("graft-delta").option("path", path).load()
    assert(back.select("id", "cat", "v").as[(Long, String, Double)]
      .collect().toSet == sample.as[(Long, String, Double)].collect().toSet)
    // append accumulates; versionAsOf pins the first commit
    Seq((4L, "b", 40.0)).toDF("id", "cat", "v")
      .write.format("graft-delta").option("path", path)
      .option("partitionBy", "cat").mode(SaveMode.Append).save()
    assert(spark.read.format("graft-delta").option("path", path).load().count() == 4)
    assert(spark.read.format("graft-delta").option("path", path)
      .option("versionAsOf", "0").load().count() == 3)
    // SaveMode semantics
    intercept[IllegalStateException] {
      sample.write.format("graft-delta").option("path", path)
        .mode(SaveMode.ErrorIfExists).save()
    }
    sample.write.format("graft-delta").option("path", path)
      .mode(SaveMode.Ignore).save() // no-op
    assert(DeltaInterop.latestVersion(spark, path) == 1L)
    // filters through the standard API stay exact
    assert(spark.read.format("graft-delta").option("path", path).load()
      .filter(col("cat") === "a").select("id").as[Long].collect().toSet ==
      Set(1L, 2L))
  }

  test("graft-hudi: keyed insert-then-upsert by format name, incremental pull") {
    val path = tmp("hudi")
    // duplicate key in the first batch: combine-before-insert keeps ts=200
    Seq((1L, "a", 1.0, 100L), (1L, "a", 2.0, 200L), (2L, "b", 5.0, 100L))
      .toDF("id", "cat", "v", "ts")
      .write.format("graft-hudi").option("path", path)
      .option("recordKey", "id").option("precombine", "ts")
      .option("partitionBy", "cat").save()
    val i1 = HudiInterop.completedInstants(spark, path).last
    // second save routes to upsert: id=1 advances, id=3 inserts
    Seq((1L, "a", 9.0, 300L), (3L, "c", 7.0, 100L))
      .toDF("id", "cat", "v", "ts")
      .write.format("graft-hudi").option("path", path)
      .option("recordKey", "id").option("precombine", "ts")
      .option("partitionBy", "cat").mode(SaveMode.Append).save()
    val back = spark.read.format("graft-hudi").option("path", path).load()
    assert(back.select("id", "v").as[(Long, Double)].collect().toSet ==
      Set((1L, 9.0), (2L, 5.0), (3L, 7.0)))
    // incremental pull: only the second commit's records
    assert(spark.read.format("graft-hudi").option("path", path)
      .option("beginInstant", i1).load()
      .select("id").as[Long].collect().toSet == Set(1L, 3L))
    // overwrite refuses loudly (Hudi evolves by upsert)
    intercept[IllegalArgumentException] {
      sample.write.format("graft-hudi").option("path", path)
        .option("recordKey", "id").option("precombine", "v")
        .mode(SaveMode.Overwrite).save()
    }
  }

  test("graft-delta streaming source tails appends; compaction re-emits nothing") {
    import org.apache.spark.sql.streaming.Trigger
    val path = tmp("tail")
    val ckpt = tmp("tail-ckpt")
    val out = tmp("tail-out")
    sample.write.format("graft-delta").option("path", path)
      .option("partitionBy", "cat").save()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-delta").option("path", path)
        .option("startingVersion", "0").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() == 3, "startingVersion=0 replays v0")
    // append lands; maintenance commit between drains must re-emit nothing
    Seq((4L, "a", 40.0)).toDF("id", "cat", "v")
      .write.format("graft-delta").option("path", path)
      .option("partitionBy", "cat").mode(org.apache.spark.sql.SaveMode.Append).save()
    graft.sinks.DeltaInterop.compact(spark, path)
    drain()
    val got = spark.read.parquet(out)
    assert(got.count() == 4, s"one new row, zero re-emits (${got.count()})")
    assert(got.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    // a data-rewriting commit fails the tail loudly
    graft.sinks.DeltaInterop.delete(spark, path, col("id") === 1L)
    val q = spark.readStream.format("graft-delta").option("path", path).load()
      .writeStream.format("noop").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getCause.getMessage.contains("ignoreChanges"))
  }

  test("graft-delta streaming CDF source: the tail emits typed changes, not rows") {
    import org.apache.spark.sql.streaming.Trigger
    val path = tmp("cdf-tail")
    val ckpt = tmp("cdf-tail-ckpt")
    val out = tmp("cdf-tail-out")
    sample.write.format("graft-delta").option("path", path)
      .option("partitionBy", "cat").save()                              // v0
    DeltaInterop.setTableProperties(spark, path,
      Map("delta.enableChangeDataFeed" -> "true"))                      // v1
    def drain(): Unit = {
      val q = spark.readStream.format("graft-delta").option("path", path)
        .option("startingVersion", "0").option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val first = spark.read.parquet(out)
    assert(first.schema.fieldNames.contains("_change_type"))
    assert(first.count() == 3, "v0's rows arrive as synthesized inserts")
    // a rewrite that would fail the plain tail streams FINE as changes
    DeltaInterop.delete(spark, path, col("id") === 2L)                  // v2
    drain()
    val got = spark.read.parquet(out)
      .groupBy(col("_change_type")).count().as[(String, Long)].collect().toMap
    assert(got == Map("insert" -> 3L, "delete" -> 1L))
  }

  test("graft-hudi streaming source is the incremental pull: updates re-emit, carries don't") {
    import org.apache.spark.sql.streaming.Trigger
    val path = tmp("htail")
    val ckpt = tmp("htail-ckpt")
    val out = tmp("htail-out")
    def save(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("graft-hudi").option("path", path)
        .option("recordKey", "id").option("precombine", "ts")
        .option("partitionBy", "cat")
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    save(Seq((1L, "a", 1.0, 100L), (2L, "a", 2.0, 100L)).toDF("id", "cat", "v", "ts"))
    def drain(): Unit = {
      val q = spark.readStream.format("graft-hudi").option("path", path)
        .option("beginInstant", "0").load()
        .drop(graft.sinks.HudiInterop.MetaCols: _*)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() == 2, "replay from 0 emits the insert")
    // upsert updates id=1 and inserts id=3: the window emits exactly those
    // two row versions; id=2's carried copy keeps its commit time and drops out
    save(Seq((1L, "a", 9.0, 200L), (3L, "b", 3.0, 100L)).toDF("id", "cat", "v", "ts"))
    drain()
    val got = spark.read.parquet(out).select("id", "v").as[(Long, Double)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got(1L) == Set(1.0, 9.0), "the update re-emits id=1's new version")
    assert(got(2L) == Set(2.0), "the carried row is NOT re-emitted")
    assert(got(3L) == Set(3.0))
  }

  test("graft-iceberg streaming source tails the snapshot chain; replace emits nothing") {
    import org.apache.spark.sql.streaming.Trigger
    val path = tmp("itail")
    val ckpt = tmp("itail-ckpt")
    val out = tmp("itail-out")
    sample.write.format("graft-iceberg").option("path", path)
      .option("partitionBy", "cat").save()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-iceberg").option("path", path)
        .option("startingSnapshot", "earliest").load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() == 3)
    // append + compaction between drains: exactly one new row arrives
    Seq((4L, "a", 40.0)).toDF("id", "cat", "v")
      .write.format("graft-iceberg").option("path", path)
      .option("partitionBy", "cat").mode(org.apache.spark.sql.SaveMode.Append).save()
    graft.sinks.IcebergInterop.compact(spark, path)
    drain()
    val got = spark.read.parquet(out)
    assert(got.count() == 4, s"compaction must re-emit nothing (${got.count()})")
    assert(got.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
  }

  test("graft-iceberg tail fails loudly when rollback rewrites the snapshot chain") {
    import org.apache.spark.sql.streaming.Trigger
    val path = tmp("rb-tail")
    val ckpt = tmp("rb-tail-ckpt")
    val out = tmp("rb-tail-out")
    sample.write.format("graft-iceberg").option("path", path).save()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-iceberg").option("path", path)
        .option("startingSnapshot", "earliest").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val s1 = IcebergInterop.snapshotChain(spark, path).get.head
    Seq((4L, "c", 44.0)).toDF("id", "cat", "v")
      .write.format("graft-iceberg").option("path", path)
      .mode(SaveMode.Append).save()
    drain()
    assert(spark.read.parquet(out).count() == 4)
    // rollback rewrites the ancestor chain; enough appends rebuild the
    // depth past the checkpoint — the tail must refuse, never skip
    IcebergInterop.rollbackTo(spark, path, s1)
    (0 to 2).foreach { i =>
      Seq((10L + i, "r", 1.0)).toDF("id", "cat", "v")
        .write.format("graft-iceberg").option("path", path)
        .mode(SaveMode.Append).save()
    }
    val q = spark.readStream.format("graft-iceberg").option("path", path)
      .option("startingSnapshot", "earliest").load()
      .writeStream.format("noop").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getCause.getMessage.contains("rewritten"))
  }

  test("graft-iceberg: partitioned write by format name, snapshot time travel") {
    val path = tmp("iceberg")
    sample.write.format("graft-iceberg").option("path", path)
      .option("partitionBy", "cat").save()
    val s1 = {
      // latest snapshot id via a read of the metadata-backed relation
      IcebergInterop.read(spark, path) // force table existence
      val meta = scala.io.Source.fromFile(
        s"$path/metadata/v1.metadata.json").mkString
      "\"current-snapshot-id\"\\s*:\\s*(\\d+)".r
        .findFirstMatchIn(meta).get.group(1).toLong
    }
    Seq((4L, "b", 40.0)).toDF("id", "cat", "v")
      .write.format("graft-iceberg").option("path", path)
      .option("partitionBy", "cat").mode(SaveMode.Append).save()
    def rel = spark.read.format("graft-iceberg").option("path", path)
    assert(rel.load().count() == 4)
    assert(rel.option("snapshotId", s1.toString).load().count() == 3)
    // filter + projection through the standard API
    assert(rel.load().filter(col("cat") === "b" && col("v") > 35.0)
      .select("id").as[Long].collect().toSeq == Seq(4L))
  }

  // --- streaming SINKS by format name (the reference stream jobs' shape) ---

  /** Stage each row group as its own parquet file and tail the dir with
    * maxFilesPerTrigger=1, so every file becomes one micro-batch commit.
    */
  private def fileFeed(tag: String, batches: Seq[org.apache.spark.sql.DataFrame])
      : (String, org.apache.spark.sql.DataFrame) = {
    val feed = tmp(tag)
    batches.zipWithIndex.foreach { case (b, i) =>
      b.coalesce(1).write.parquet(s"$feed/b$i")
      val f = new java.io.File(s"$feed/b$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(f.toPath, new java.io.File(s"$feed/f$i.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$feed/b$i"))
    }
    val src = spark.readStream.schema(batches.head.schema)
      .option("maxFilesPerTrigger", "1").parquet(feed)
    (feed, src)
  }

  test("graft-delta streaming sink: one txn commit per micro-batch, replay is a no-op") {
    import org.apache.spark.sql.streaming.Trigger
    val path = tmp("dsink")
    val ckpt = tmp("dsink-ckpt")
    val (_, src) = fileFeed("dsink-feed", Seq(
      Seq((1L, "a", 10.0), (2L, "a", 20.0)).toDF("id", "cat", "v"),
      Seq((3L, "b", 30.0)).toDF("id", "cat", "v")))
    def run(): Unit = {
      val q = src.writeStream.format("graft-delta")
        .option("path", path).partitionBy("cat")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    val v1 = DeltaInterop.latestVersion(spark, path)
    assert(v1 == 1L) // two micro-batches → commits 0 and 1
    assert(spark.read.format("graft-delta").option("path", path).load()
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // restart on the same checkpoint with no new files: nothing commits
    run()
    assert(DeltaInterop.latestVersion(spark, path) == v1)
  }

  test("graft-hudi streaming sink: duplicate landings converge to one keyed copy") {
    import org.apache.spark.sql.streaming.Trigger
    val path = tmp("hsink")
    val batch = Seq((1L, "a", 1.0, 100L), (2L, "b", 5.0, 100L))
      .toDF("id", "cat", "v", "ts")
    // the SAME rows land twice (two files) — the reference's dup repro
    val (_, src) = fileFeed("hsink-feed", Seq(batch, batch))
    val q = src.writeStream.format("graft-hudi")
      .option("path", path).partitionBy("cat")
      .option("recordKey", "id").option("precombine", "ts")
      .option("checkpointLocation", tmp("hsink-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val back = spark.read.format("graft-hudi").option("path", path).load()
    assert(back.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("graft-iceberg streaming sink: snapshots per batch, missing hudi keys fail at start") {
    import org.apache.spark.sql.streaming.Trigger
    val path = tmp("isink")
    val (_, src) = fileFeed("isink-feed", Seq(
      Seq((1L, "a", 10.0)).toDF("id", "cat", "v"),
      Seq((2L, "b", 20.0)).toDF("id", "cat", "v")))
    val q = src.writeStream.format("graft-iceberg")
      .option("path", path)
      .option("checkpointLocation", tmp("isink-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.format("graft-iceberg").option("path", path).load()
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
    // hudi sink without recordKey/precombine refuses at sink construction
    val err = intercept[Exception] {
      src.writeStream.format("graft-hudi")
        .option("path", tmp("hbad"))
        .option("checkpointLocation", tmp("hbad-ckpt"))
        .trigger(Trigger.AvailableNow()).start()
    }
    assert(err.getMessage.contains("recordKey") ||
      Option(err.getCause).exists(_.getMessage.contains("recordKey")))
  }
}
