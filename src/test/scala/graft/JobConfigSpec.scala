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

  test("queue and file transports parse a csv feed identically (header row never ingested)") {
    val work = Files.createTempDirectory("graft-jobcsv").toFile.getAbsolutePath
    val events = Tables.events(spark, sf)
    // feed-shaped csv (ts as int64 nanos), header row included — the
    // shape both transports must read the same way
    events.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.option("header", "true").csv(s"$work/landing")
    Files.createDirectories(Paths.get(s"$work/q"))
    val files = new java.io.File(s"$work/landing").listFiles()
      .map(_.getAbsolutePath).filter(_.endsWith(".csv")).sorted
    files.zipWithIndex.foreach { case (f, i) =>
      write(s"$work/q/m$i.json", s"""{"path": "$f", "timestamp": ${100 + i}}""")
    }
    write(s"$work/app.properties",
      s"""development.ingest.source.kind = queue
         |development.ingest.source.format = csv
         |development.ingest.queue.dir = $work/q
         |development.ingest.sink.path = $work/out
         |development.ingest.checkpointLocation = $work/ckpt
         |""".stripMargin)
    val conf = JobConfig.load(s"$work/app.properties", "ingest", _ => null)
    val q = IngestJob.start(spark, conf)
    q.processAllAvailable()
    q.stop()
    val sunk = spark.read.parquet(s"$work/out")
    // header=true must ride the queue transport too: without it the
    // header row lands as a null-key data row and the count drifts
    assert(sunk.count() == events.count())
    assert(sunk.filter(col("event_id").isNull).isEmpty, "no header-derived null rows")
  }

  test("IngestJob drains on the stop-file signal and resumes from a clean checkpoint") {
    val work = Files.createTempDirectory("graft-jobstop").toFile.getAbsolutePath
    val events = Tables.events(spark, sf)
    graft.streaming.IngestPipeline.stageFeed(events, s"$work/landing", nFiles = 2)
    write(s"$work/app.properties",
      s"""development.ingest.source.path = $work/landing
         |development.ingest.sink.path = $work/out
         |development.ingest.checkpointLocation = $work/ckpt
         |development.ingest.trigger = processingTime:100
         |development.ingest.stop.file = $work/STOP
         |development.ingest.stop.pollMs = 100
         |""".stripMargin)
    val conf = JobConfig.load(s"$work/app.properties", "ingest", _ => null)
    val q = IngestJob.start(spark, conf)
    val waiter = new Thread(() => IngestJob.awaitShutdown(q, conf), "spec-await")
    waiter.start()
    q.processAllAvailable() // the long-running job has drained its backlog
    write(s"$work/STOP", "")
    waiter.join(30000)
    assert(!waiter.isAlive, "awaitShutdown must return once the marker lands")
    assert(!q.isActive, "query stopped gracefully")
    assert(spark.read.parquet(s"$work/out").count() == events.count())
    // resume from the SAME checkpoint: nothing replays (no duplicates),
    // and newly landed files flow
    val extra = events.limit(50)
      .withColumn("event_id", col("event_id") + lit(10000000L))
    graft.streaming.IngestPipeline.stageFeed(extra, s"$work/landing2")
    Files.list(Paths.get(s"$work/landing2")).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).zipWithIndex.foreach { case (f, i) =>
        Files.copy(Paths.get(f), Paths.get(s"$work/landing/resumed$i.parquet"))
      }
    val q2 = IngestJob.start(spark, conf)
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(s"$work/out").count() == events.count() + 50,
      "clean restart: no replayed batches, new files ingested")
  }

  test("IngestJob streams into a real Delta table from config (S3ToDeltaStreamJob shape)") {
    val work = Files.createTempDirectory("graft-jobdelta").toFile.getAbsolutePath
    graft.streaming.IngestPipeline.stageFeed(
      Tables.events(spark, sf), s"$work/landing")
    write(s"$work/app.properties",
      s"""development.ingest.source.path = $work/landing
         |development.ingest.sink.kind = delta
         |development.ingest.sink.path = $work/table
         |development.ingest.checkpointLocation = $work/ckpt
         |development.ingest.maxFilesPerTrigger = 2
         |""".stripMargin)
    val conf = JobConfig.load(s"$work/app.properties", "ingest", _ => null)
    IngestJob.start(spark, conf).awaitTermination()
    assert(new java.io.File(s"$work/table/_delta_log").isDirectory,
      "the sink is a real Delta log on disk")
    val sunk = graft.sinks.DeltaInterop.read(spark, s"$work/table")
    assert(sunk.count() == Tables.events(spark, sf).count())
    assert(sunk.columns.contains("event_date"), "enrichment columns present")
    // restart on the same checkpoint: txn-guarded, no duplicates
    IngestJob.start(spark, conf).awaitTermination()
    assert(graft.sinks.DeltaInterop.read(spark, s"$work/table").count() ==
      Tables.events(spark, sf).count())
  }
}
