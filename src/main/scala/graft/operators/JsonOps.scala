package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables

/** Semi-structured JSON operators.
  *
  * Reference: `jobs/S3CloudTrailDeltaWriterWithExplodeCT.scala:133-160`
  * (explode the Records array, flatten `record.*`, parse the event-time
  * string) and `jobs/StringTransformJob.scala:44-57` (infer a schema from
  * the JSON strings themselves, `from_json`, flatten `value.*`).
  *
  * Scale notes: schema inference reads a bounded SAMPLE (not the full
  * 100 TB); the inferred schema is then applied as a constant to the
  * codegen'd `from_json`, so the scan itself is single-pass. Explode is a
  * narrow transform — no shuffle; the only shuffle in the round-trip demo
  * below is the groupBy that builds the nested input.
  */
object JsonOps {

  /** CloudTrail-shaped round trip: pack events into per-user JSON
    * documents `{"Records":[...]}` (sorted for determinism), then do
    * exactly what the reference does — `explode($"Records")`, flatten
    * `record.*`, parse the ISO event time — and return the flat rows.
    * Output equals the flat base table, which is the oracle.
    */
  def explodeRecords(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    // Build the nested "raw file" shape (one JSON doc per user).
    val rawDocs = events
      .select(col("user_id"), struct(
        col("event_id").as("eventId"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("eventTime"),
        col("event_type").as("eventType")).as("record"))
      .groupBy(col("user_id"))
      .agg(to_json(struct(sort_array(collect_list(col("record"))).as("Records"))).as("raw"))
    // Reference pipeline: infer/declare schema, explode, flatten, parse ts.
    val recordsSchema = "STRUCT<Records: ARRAY<STRUCT<eventId: BIGINT, eventTime: STRING, eventType: STRING>>>"
    rawDocs
      .select(col("user_id"), explode(from_json(col("raw"), lit(recordsSchema)).getField("Records")).as("record"))
      .select(
        col("record.eventId").as("event_id"),
        col("user_id"),
        col("record.eventType").as("event_type"),
        to_timestamp(col("record.eventTime"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("event_second"))
      .orderBy(col("event_id"))
  }

  /** The raw-payload write shapes — the two CloudTrail writer variants
    * that do NOT flatten the record into columns:
    *
    *  - `jobs/S3CloudTrailDeltaWriterWithNonExplodeCT.scala:147-176`
    *    keeps each exploded record as ONE `to_json(record)` STRING column
    *    (`rawmsg`) beside the derived partition/enrichment columns;
    *  - `jobs/S3CloudTrailDeltaWriterWithExplodeInRawCT.scala:147-173`
    *    keeps it as a nested STRUCT column of the same name.
    *
    * Both defer schema-on-read: the sink partitions on the few derived
    * columns (index/date/subtype) while the payload stays opaque, so
    * producers never chase the event schema and consumers parse on
    * demand. [[rawJsonPayload]] is the string variant (driver-oracled:
    * the JSON text is deterministic, so DuckDB rebuilds it byte-exact);
    * [[structPayload]] is the struct variant (spec-checked: the struct
    * re-expands losslessly). Scale shape: explode + projection — narrow,
    * zero shuffle beyond the demo's doc-packing groupBy; the partition
    * columns are low-cardinality by construction so the partitioned sink
    * write behaves exactly like the enrichment pipeline's.
    */
  private def packedRecords(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val rawDocs = events
      .select(col("user_id"), struct(
        col("event_id").as("eventId"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("eventTime"),
        col("event_type").as("eventType")).as("record"))
      .groupBy(col("user_id"))
      .agg(to_json(struct(sort_array(collect_list(col("record"))).as("Records"))).as("raw"))
    val recordsSchema = "STRUCT<Records: ARRAY<STRUCT<eventId: BIGINT, eventTime: STRING, eventType: STRING>>>"
    rawDocs.select(
      explode(from_json(col("raw"), lit(recordsSchema)).getField("Records")).as("record"))
  }

  def rawJsonPayload(spark: SparkSession, dir: String): DataFrame =
    packedRecords(spark, dir)
      .select(
        to_timestamp(col("record.eventTime"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("ts"),
        col("record.eventType").as("subtype"),
        to_json(col("record")).as("rawmsg"))
      .withColumn("event_date", col("ts").cast("date"))
      .withColumn("index", lit("events"))
      .select(col("index"), col("event_date"), col("subtype"), col("rawmsg"))
      .orderBy(col("rawmsg")) // unique (embeds eventId) — oracle determinism

  def structPayload(spark: SparkSession, dir: String): DataFrame =
    packedRecords(spark, dir)
      .select(
        to_timestamp(col("record.eventTime"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("ts"),
        col("record.eventType").as("subtype"),
        col("record").as("rawmsg"))
      .withColumn("event_date", col("ts").cast("date"))
      .withColumn("index", lit("events"))
      .select(col("index"), col("event_date"), col("subtype"), col("rawmsg"))

  /** Dynamic-schema JSON extraction: infer the schema of the `props`
    * string column from a sample, `from_json` with that schema, flatten
    * every field (StringTransformJob's `select("*", "value.*")`).
    */
  /** Inferred-schema cache: at any scale the schema is inferred ONCE from
    * a bounded sample and then PINNED — re-running inference per query
    * would re-scan the sample (extra jobs) and, worse, let the schema
    * drift between runs of the same pipeline. Keyed by dataset dir.
    */
  private val inferredSchemas =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def parseJsonCol(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val inferred = inferredSchemas.computeIfAbsent(dir, { _ =>
      spark.read
        .json(events.select("props").limit(1000).as[String])
        .schema
    })
    val parsed = events
      .withColumn("props_parsed", from_json(col("props"), inferred))
    // never let an inferred JSON key shadow a base column (a props field
    // named "event_id" would otherwise silently clobber the real id
    // before the final select)
    val flat = inferred.fieldNames.sorted
      .filterNot(events.columns.contains)
    flat.foldLeft(parsed) { (df, f) =>
      df.withColumn(f, col(s"props_parsed.$f"))
    }
      .drop("props", "props_parsed")
      .select(col("event_id") +: flat.map(col): _*)
      .orderBy(col("event_id"))
  }

  val ops: Seq[Op] = Seq(
    Op("q_json_explode", explodeRecords,
      Some("""
        SELECT event_id, user_id, event_type,
               date_trunc('second', ts) AS event_second
        FROM events ORDER BY event_id""")),
    Op("q_json_extract", parseJsonCol,
      Some("""
        SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
        FROM events ORDER BY event_id""")),
    Op("q_json_rawmsg", rawJsonPayload,
      // DuckDB rebuilds the exact JSON text Spark's to_json emits for the
      // (eventId, eventTime, eventType) struct — both engines print
      // compact JSON with insertion-ordered keys
      Some("""
        SELECT 'events' AS index,
               CAST(ts AS DATE) AS event_date,
               event_type AS subtype,
               CAST(to_json(struct_pack(
                 eventId := event_id,
                 eventTime := strftime(ts, '%Y-%m-%dT%H:%M:%SZ'),
                 eventType := event_type)) AS VARCHAR) AS rawmsg
        FROM events ORDER BY rawmsg"""))
  )
}
