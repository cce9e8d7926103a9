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
    // daily hidden partitioning: the granularity a user would pick for
    // this feed's volume (bucket() composition is spec-covered; at bench
    // SF it would fragment ~8× more dirs than the data justifies and the
    // run would measure file churn, not engine throughput)
    spark.sql(
      s"""CREATE TABLE graft.$ns.events
          (event_id BIGINT, user_id BIGINT, event_type STRING,
           value DOUBLE, ts TIMESTAMP)
          PARTITIONED BY (days(ts))""")
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
    // COW UPDATE on the hidden-partitioned layout (×2 keeps doubles exact)
    spark.sql(
      s"""UPDATE graft.$ns.events SET value = value * 2
          WHERE event_type = 'view' AND user_id <= 150""")
    spark.sql(
      s"""SELECT event_type, count(*) AS n_events,
                 cast(sum(cast(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
                 count(DISTINCT user_id) AS n_users
          FROM graft.$ns.events
          WHERE ts >= TIMESTAMP '2024-01-05'
          GROUP BY event_type
          ORDER BY event_type""")
  }

  /** SQL MERGE INTO through the catalog: orders become the target, a
    * derived feed (overlapping updates + out-of-range inserts) the
    * source, and the three clause kinds fire in declared order. Oracle =
    * the merge algebra spelled out over the raw orders table (left join
    * for matched clauses, anti join for inserts).
    */
  def sqlMergeRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val ns = "v" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE NAMESPACE graft.$ns")
    spark.sql(
      s"""CREATE TABLE graft.$ns.orders
          (o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
           o_totalprice DOUBLE)""")
    graft.sources.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_merge_orders_src")
    spark.sql(
      s"""INSERT INTO graft.$ns.orders
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
          FROM graft_merge_orders_src""")
    spark.sql(
      s"""MERGE INTO graft.$ns.orders t
          USING (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM graft_merge_orders_src WHERE o_orderkey % 3 = 0
            UNION ALL
            SELECT o_orderkey + 1000000000000 AS o_orderkey, o_custkey,
                   o_orderstatus, o_totalprice
            FROM graft_merge_orders_src WHERE o_orderkey % 7 = 0
          ) s
          ON t.o_orderkey = s.o_orderkey
          WHEN MATCHED AND s.o_orderstatus = 'F'
            THEN UPDATE SET o_totalprice = s.o_totalprice * 2
          WHEN MATCHED AND s.o_totalprice < 150000 THEN DELETE
          WHEN NOT MATCHED THEN INSERT *""")
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n_orders,
                 cast(sum(cast(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
          FROM graft.$ns.orders
          GROUP BY o_orderstatus
          ORDER BY o_orderstatus""")
  }

  /** The same DDL→INSERT→DELETE→UPDATE→aggregate lifecycle as
    * [[sqlCatalogRoundTrip]], driven from the ORDERS table. Exists so the
    * catalog face always has a lifecycle signal that does not depend on
    * the events table's physical ts encoding — one table's schema drift
    * must not zero the whole catalog correctness signal (round-3 lesson:
    * every catalog query happened to route through events).
    */
  def sqlLifecycleRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val ns = "v" + java.util.UUID.randomUUID().toString.replace("-", "")
    spark.sql(s"CREATE NAMESPACE graft.$ns")
    spark.sql(
      s"""CREATE TABLE graft.$ns.orders
          (o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
           o_totalprice DOUBLE, o_orderdate TIMESTAMP)
          PARTITIONED BY (months(o_orderdate))""")
    graft.sources.Tables.orders(spark, dir)
      .createOrReplaceTempView("graft_lifecycle_orders_src")
    spark.sql(
      s"""INSERT INTO graft.$ns.orders
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
          FROM graft_lifecycle_orders_src""")
    spark.sql(
      s"""DELETE FROM graft.$ns.orders
          WHERE o_orderstatus = 'F' AND o_custkey BETWEEN 100 AND 400""")
    spark.sql(
      s"""UPDATE graft.$ns.orders SET o_totalprice = o_totalprice * 2
          WHERE o_orderstatus = 'O' AND o_custkey <= 200""")
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n_orders,
                 cast(sum(cast(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
                 count(DISTINCT o_custkey) AS n_custs
          FROM graft.$ns.orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          GROUP BY o_orderstatus
          ORDER BY o_orderstatus""")
  }

  val ops: Seq[graft.Op] = Seq(
    graft.Op("q_sql_lifecycle", sqlLifecycleRoundTrip,
      Some("""
        SELECT o_orderstatus, count(*) AS n_orders,
               cast(sum(cast(
                 CASE WHEN o_orderstatus = 'O' AND o_custkey <= 200
                      THEN o_totalprice * 2 ELSE o_totalprice END
                 AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
               count(DISTINCT o_custkey) AS n_custs
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND NOT (o_orderstatus = 'F' AND o_custkey BETWEEN 100 AND 400)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),
    graft.Op("q_sql_catalog", sqlCatalogRoundTrip,
      Some("""
        SELECT event_type, count(*) AS n_events,
               cast(sum(cast(
                 CASE WHEN event_type = 'view' AND user_id <= 150
                      THEN value * 2 ELSE value END AS DECIMAL(38,6))) AS DOUBLE)
                 AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-05'
          AND NOT (event_type = 'error' AND user_id BETWEEN 300 AND 600)
        GROUP BY event_type
        ORDER BY event_type""")),
    graft.Op("q_sql_merge", sqlMergeRoundTrip,
      Some("""
        WITH s AS (
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey % 3 = 0
          UNION ALL
          SELECT o_orderkey + 1000000000000 AS o_orderkey, o_custkey,
                 o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey % 7 = 0),
        merged AS (
          SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
                 CASE WHEN s.o_orderkey IS NOT NULL AND s.o_orderstatus = 'F'
                      THEN s.o_totalprice * 2 ELSE t.o_totalprice END AS o_totalprice,
                 CASE WHEN s.o_orderkey IS NOT NULL
                           AND NOT (s.o_orderstatus = 'F')
                           AND s.o_totalprice < 150000
                      THEN 1 ELSE 0 END AS del
          FROM orders t LEFT JOIN s ON t.o_orderkey = s.o_orderkey
          UNION ALL
          SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_totalprice, 0 AS del
          FROM s LEFT JOIN orders t ON t.o_orderkey = s.o_orderkey
          WHERE t.o_orderkey IS NULL)
        SELECT o_orderstatus, count(*) AS n_orders,
               cast(sum(cast(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        FROM merged
        WHERE del = 0
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")))
}
