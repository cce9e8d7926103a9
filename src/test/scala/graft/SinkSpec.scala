package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.TableSink
import graft.sinks.TableSink.SinkConfig
import graft.sources.Tables

class SinkSpec extends SparkSpec {

  test("parquet sink writes hive-partitioned layout; reads prune partitions") {
    val out = Files.createTempDirectory("graft-sink").toFile.getAbsolutePath + "/t"
    val ev = Tables.events(spark, sf)
      .withColumn("event_date", col("ts").cast("date"))
    TableSink.writeBatch(ev, SinkConfig(
      format = "parquet", path = out, partitionBy = Seq("event_date"), mode = "overwrite"))

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("event_date=")), dirs.mkString(","))

    val firstDate = dirs.map(_.stripPrefix("event_date=")).min
    val pruned = TableSink.read(spark, out).filter(col("event_date") === lit(firstDate))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    // count matches the source for that date → layout + pruning are lossless
    val expected = ev.filter(col("event_date") === lit(firstDate)).count()
    assert(pruned.count() == expected)
  }

  test("hudi config maps upsert keys and partitioning to hudi options") {
    val opts = TableSink.options(SinkConfig(
      format = "hudi", path = "/x", partitionBy = Seq("date", "country"),
      tableName = Some("events"), upsertKey = Some("ingest_id"), precombine = Some("ts")))
    assert(opts("hoodie.table.name") == "events")
    assert(opts("hoodie.datasource.write.operation") == "upsert")
    assert(opts("hoodie.datasource.write.recordkey.field") == "ingest_id")
    assert(opts("hoodie.datasource.write.precombine.field") == "ts")
    assert(opts("hoodie.datasource.write.partitionpath.field") == "date,country")
  }

  test("non-parquet formats fail fast without their connector jars") {
    val e = intercept[IllegalArgumentException] {
      TableSink.writeBatch(Tables.region(spark, sf),
        SinkConfig(format = "delta", path = "/tmp/nope"))
    }
    assert(e.getMessage.contains("connector jar"))
    intercept[IllegalArgumentException] {
      TableSink.writeBatch(Tables.region(spark, sf), SinkConfig(format = "bogus", path = "/t"))
    }
  }
}
