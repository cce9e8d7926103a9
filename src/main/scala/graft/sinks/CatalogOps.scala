package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-checkable round trip for the SQL catalog face
  * ([[org.apache.spark.sql.graft.catalog.GraftCatalog]]): the whole
  * DDL/DML lifecycle — CREATE a hidden-partitioned table, INSERT the
  * events feed, DELETE a slice, aggregate what remains — runs through
  * `spark.sql` against `graft.<ns>.<table>` identifiers, exactly how the
  * reference's SQL jobs drive their Delta/Hudi tables. Oracle = the same
  * pipeline algebraically collapsed over the raw events parquet (the
  * catalog, versioned log, and hidden partitioning must be invisible to
  * results).
  */
object CatalogOps {

  def sqlCatalogRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    // unique namespace per invocation: the warehouse is a shared tmp dir
    val ns = "v" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE NAMESPACE graft.$ns")
    spark.sql(
      s"""CREATE TABLE graft.$ns.events
          (event_id BIGINT, user_id BIGINT, event_type STRING,
           value DOUBLE, ts TIMESTAMP)
          PARTITIONED BY (days(ts), bucket(8, user_id))""")
    graft.sources.Tables.events(spark, dir)
      .createOrReplaceTempView("graft_catalog_events_src")
    spark.sql(
      s"""INSERT INTO graft.$ns.events
          SELECT event_id, user_id, event_type, value, ts
          FROM graft_catalog_events_src""")
    // the predicate stays within source-Filter shapes (equality + range)
    // so the DELETE plans as a metadata-only SupportsDelete
    spark.sql(
      s"""DELETE FROM graft.$ns.events
          WHERE event_type = 'error' AND user_id BETWEEN 300 AND 600""")
    spark.sql(
      s"""SELECT event_type, count(*) AS n_events,
                 cast(sum(cast(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
                 count(DISTINCT user_id) AS n_users
          FROM graft.$ns.events
          WHERE ts >= TIMESTAMP '2024-01-05'
          GROUP BY event_type
          ORDER BY event_type""")
  }

  val ops: Seq[graft.Op] = Seq(
    graft.Op("q_sql_catalog", sqlCatalogRoundTrip,
      Some("""
        SELECT event_type, count(*) AS n_events,
               cast(sum(cast(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-05'
          AND NOT (event_type = 'error' AND user_id BETWEEN 300 AND 600)
        GROUP BY event_type
        ORDER BY event_type""")))
}
