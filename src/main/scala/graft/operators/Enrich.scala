package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables

/** Ingest enrichment: the reference's T stage re-expressed as a reusable
  * column battery.
  *
  * Reference: `jobs/S3ToParquetStreamJob.scala:66-76` — parse the string
  * invoice timestamp, derive the partition date, stamp a normalized ingest
  * timestamp and a UUID (via a Scala UDF). Spark-first changes:
  *  - the row id is a DETERMINISTIC 128-bit digest of the natural key
  *    formatted as a UUID (content-addressed: re-ingest of the same row
  *    produces the same id, so exactly-once dedup downstream is possible —
  *    the reference's random-UUID UDF made every retry a new row, the
  *    root cause of its Hudi duplicate repro, README.md:115-122);
  *  - all derivations are codegen'd built-ins, no UDFs;
  *  - `current_timestamp` ingest stamping is kept (streaming path) but the
  *    batch/oracle surface exposes only deterministic columns.
  */
object Enrich {

  /** Deterministic UUID-shaped id from arbitrary key columns (md5 of the
    * concatenated key, hex grouped 8-4-4-4-12).
    */
  def deterministicUuid(key: Column*): Column = {
    val h = md5(concat_ws("\u0000", key.map(_.cast("string")): _*))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  /** Multi-format string→timestamp normalization: first format that parses
    * wins (reference hardcodes one format per job; real feeds mix them).
    */
  def parseEventTime(s: Column): Column =
    coalesce(
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss'Z'")),
      try_to_timestamp(s, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(s, lit("yyyy/MM/dd HH:mm:ss")),
      try_to_timestamp(s, lit("yyyy-MM-dd")))

  /** Full enrichment over a raw event frame (streaming-safe: every column
    * is a per-row expression; `ingest_ts` is the only nondeterministic one
    * and is excluded from the oracle surface).
    */
  def enrichFrame(df: DataFrame): DataFrame =
    df
      .withColumn("event_date", col("ts").cast("date"))
      .withColumn("event_hour", hour(col("ts")))
      .withColumn("event_second", date_trunc("second", col("ts")))
      .withColumn("ingest_id", deterministicUuid(col("event_id")))
      // ingest stamp via StableStamp, NOT current_timestamp(): the
      // latter folds to a fresh literal per invocation/micro-batch and
      // forces a whole-stage-codegen recompile of every stage this
      // column flows through (see StableStamp's scaladoc); the stamp is
      // read per task, so each micro-batch records its own arrival time
      .withColumn("ingest_ts", org.apache.spark.sql.GraftShim.column(
        graft.functions.StableStamp()))

  /** Oracle-facing enrichment query (deterministic columns only). The
    * iso→reparse pair exercises format+parse round-tripping the way the
    * reference's `to_timestamp(InvoiceTimestamp)` does.
    */
  def enrich(spark: SparkSession, dir: String): DataFrame =
    enrichFrame(Tables.events(spark, dir))
      .withColumn("iso", date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .withColumn("reparsed", parseEventTime(col("iso")))
      .select(
        col("event_id"), col("event_date"), col("event_hour"),
        col("event_second"), col("ingest_id"), col("iso"), col("reparsed"))
      .orderBy(col("event_id"))

  val ops: Seq[Op] = Seq(
    Op("q_enrich", enrich,
      Some("""
        SELECT event_id,
          CAST(ts AS DATE) AS event_date,
          CAST(EXTRACT(HOUR FROM ts) AS INT) AS event_hour,
          date_trunc('second', ts) AS event_second,
          concat_ws('-',
            substr(md5(CAST(event_id AS VARCHAR)), 1, 8),
            substr(md5(CAST(event_id AS VARCHAR)), 9, 4),
            substr(md5(CAST(event_id AS VARCHAR)), 13, 4),
            substr(md5(CAST(event_id AS VARCHAR)), 17, 4),
            substr(md5(CAST(event_id AS VARCHAR)), 21, 12)) AS ingest_id,
          strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso,
          date_trunc('second', ts) AS reparsed
        FROM events
        ORDER BY event_id"""))
  )
}
