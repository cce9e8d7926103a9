package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.jobs.{IngestJob, JobConfig}
import graft.sources.Tables

/** The conf-driven job surface: env-scoped properties resolve like the
  * reference's application.conf blocks, and the IngestJob main wires a
  * whole pipeline (file or queue source → enrich → sink) from one block.
  */
class JobConfigSpec extends SparkSpec {

  private def write(path: String, body: String): Unit =
    Files.write(Paths.get(path), body.getBytes(StandardCharsets.UTF_8))

  test("config: ENVIRONMENT selects the block; missing keys name themselves") {
    val dir = Files.createTempDirectory("graft-jobconf").toFile.getAbsolutePath
    write(s"$dir/app.properties",
      """development.ingest.source.path = /dev/landing
        |development.ingest.sink.path = /dev/out
        |prod.ingest.source.path = /prod/landing
        |""".stripMargin)
    val dev = JobConfig.load(s"$dir/app.properties", "ingest", _ => null)
    assert(dev.env == "development" && dev("source.path") == "/dev/landing")
    val prod = JobConfig.load(s"$dir/app.properties", "ingest",
      k => if (k == "ENVIRONMENT") "prod" else null)
    assert(prod("source.path") == "/prod/landing")
    val e = intercept[IllegalArgumentException](prod("sink.path"))
    assert(e.getMessage.contains("prod.ingest.sink.path"))
    val e2 = intercept[IllegalArgumentException](
      JobConfig.load(s"$dir/app.properties", "nosuch", _ => null))
    assert(e2.getMessage.contains("nosuch"))
  }

  test("IngestJob runs a configured file-source pipeline end to end") {
    val work = Files.createTempDirectory("graft-jobrun").toFile.getAbsolutePath
    // stage the feed shape (int64-nanos ts)
    graft.streaming.IngestPipeline.stageFeed(
      Tables.events(spark, sf), s"$work/landing")
    write(s"$work/app.properties",
      s"""development.ingest.source.path = $work/landing
         |development.ingest.sink.path = $work/out
         |development.ingest.checkpointLocation = $work/ckpt
         |development.ingest.dedup = true
         |development.ingest.maxFilesPerTrigger = 2
         |""".stripMargin)
    val conf = JobConfig.load(s"$work/app.properties", "ingest", _ => null)
    val q = IngestJob.start(spark, conf)
    q.awaitTermination()
    val sunk = spark.read.parquet(s"$work/out")
    assert(sunk.count() == Tables.events(spark, sf).count())
    assert(sunk.columns.contains("event_date"), "partitioned by the enriched date")
  }

  test("IngestJob drives the queue transport + graft-table sink from config") {
    val work = Files.createTempDirectory("graft-jobq").toFile.getAbsolutePath
    graft.streaming.IngestPipeline.stageFeed(
      Tables.events(spark, sf), s"$work/landing", nFiles = 3)
    Files.createDirectories(Paths.get(s"$work/q"))
    val files = new java.io.File(s"$work/landing").listFiles()
      .map(_.getAbsolutePath).filter(_.endsWith(".parquet")).sorted
    files.zipWithIndex.foreach { case (f, i) =>
      write(s"$work/q/m$i.json", s"""{"path": "$f", "timestamp": ${100 + i}}""")
    }
    write(s"$work/app.properties",
      s"""development.ingest.source.kind = queue
         |development.ingest.queue.dir = $work/q
         |development.ingest.sink.kind = graft-table
         |development.ingest.sink.path = $work/tbl
         |development.ingest.sink.partitionBy = event_type
         |development.ingest.key = event_id
         |development.ingest.precombine = event_id
         |development.ingest.checkpointLocation = $work/ckpt
         |development.ingest.trigger = processingTime:0
         |development.ingest.visibilityTimeoutMs = 60000
         |development.ingest.maxReceiveCount = 5
         |""".stripMargin)
    val conf = JobConfig.load(s"$work/app.properties", "ingest", _ => null)
    val q = IngestJob.start(spark, conf)
    q.processAllAvailable()
    q.stop()
    val table = graft.sinks.VersionedTable.read(spark, s"$work/tbl")
    assert(table.count() == Tables.events(spark, sf).count())
    assert(Files.list(Paths.get(s"$work/q")).count() == 0, "messages acked after commit")
  }
}
