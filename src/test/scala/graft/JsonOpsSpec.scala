package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.JsonOps
import graft.sources.Tables

/** The CloudTrail raw-payload write shapes (reference
  * `S3CloudTrailDeltaWriterWithNonExplodeCT` / `...ExplodeInRawCT`):
  * exploded records written with the payload kept opaque — a JSON string
  * or a nested struct — beside the derived partition columns.
  */
class JsonOpsSpec extends SparkSpec {

  test("raw-JSON payload is lossless: rawmsg parses back to the base events") {
    val events = Tables.events(spark, sf)
    val out = JsonOps.rawJsonPayload(spark, sf)
    assert(out.count() == events.count(), "explode emits one row per event")
    // the opaque payload is schema-on-read: parsing it recovers the ids
    val recovered = out.select(
      get_json_object(col("rawmsg"), "$.eventId").cast("long").as("event_id"),
      get_json_object(col("rawmsg"), "$.eventType").as("event_type"))
    assert(recovered.except(events.select("event_id", "event_type")).isEmpty)
    assert(events.select("event_id", "event_type").except(recovered).isEmpty)
    // derived partition columns agree with the payload they index
    val drift = out.filter(
      get_json_object(col("rawmsg"), "$.eventType") =!= col("subtype") ||
      to_timestamp(get_json_object(col("rawmsg"), "$.eventTime"),
        "yyyy-MM-dd'T'HH:mm:ss'Z'").cast("date") =!= col("event_date"))
    assert(drift.isEmpty, "partition columns derive from the payload")
  }

  test("struct payload re-expands losslessly and round-trips a partitioned sink") {
    val events = Tables.events(spark, sf)
    val out = JsonOps.structPayload(spark, sf)
    // rawmsg.* recovers the flattened view — the ExplodeCT/ExplodeInRawCT
    // variants differ only in when the flatten happens
    val flat = out.select(
      col("rawmsg.eventId").as("event_id"),
      col("rawmsg.eventType").as("event_type"))
    assert(flat.except(events.select("event_id", "event_type")).isEmpty)
    assert(events.select("event_id", "event_type").except(flat).isEmpty)
    // the reference job's sink shape: partitioned by the derived columns,
    // payload column stays opaque through the write
    val dir = Files.createTempDirectory("graft-rawmsg").toFile.getAbsolutePath
    graft.sinks.TableSink.writeBatch(out,
      graft.sinks.TableSink.SinkConfig(
        format = "parquet", path = dir,
        partitionBy = Seq("index", "event_date", "subtype"),
        mode = "overwrite"))
    val back = spark.read.parquet(dir)
    assert(back.count() == events.count())
    assert(back.select(col("rawmsg.eventId")).except(
      events.select(col("event_id"))).isEmpty, "payload survives the sink byte-intact")
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("index=")), s"hive layout on index first: ${dirs.toSeq}")
  }
}
