package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Op
import graft.sources.Tables

/** Batch relational core: the verification-query surface of the reference's
  * batch readers plus the standard analytics shapes any consumer of the
  * engine runs.
  *
  * Re-expresses (Spark-first, not a port):
  *  - count / groupBy-count / distinct-count / HAVING: S3ParquetBatchReader.scala:40-70,
  *    DiskBasedTransformJob.scala:44-50 (reference runs these to validate
  *    every sink format).
  *  - date/time battery: DiskBasedTransformJob.scala:51-67.
  *  - The join / window / rollup shapes complete the analytics surface a
  *    lakehouse consumer needs over the ingested tables.
  *
  * Scale notes: all aggregations are partial-agg friendly (sum/count over
  * decimal), dim joins are explicitly `broadcast`, and every filter is a
  * plain column predicate so it reaches the parquet scan (`PushedFilters`).
  */
object Relational {

  /** Exact money arithmetic: DECIMAL(18,4) is wide enough for TPC-H-style
    * prices and makes SUM order-independent (FP sum is not associative;
    * a 1000-executor sum would otherwise differ run-to-run and engine-to-
    * engine). Final values are cast back to DOUBLE for a stable schema.
    */
  private val Money = DecimalType(18, 4)
  private def dec(c: Column): Column = c.cast(Money)
  private def one: Column = lit(1).cast(Money)

  def scanCount(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(count(lit(1)).as("n_rows"))

  def groupCount(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("l_partkey"))

  def distinctCount(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(countDistinct(col("l_partkey")).as("n_distinct"))

  /** HLL++ approximate distinct — at 100 TB the exact distinct's
    * full shuffle of every key is rarely worth it; the sketch merges
    * map-side in constant memory. Checked in spec against the exact
    * count (≤2% relative error at the default rsd=0.01... spec allows 5%).
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(approx_count_distinct(col("l_partkey"), rsd = 0.01).as("n_distinct_approx"))

  /** Exact per-group percentiles (linear interpolation — same definition
    * as DuckDB's quantile_cont, which is the oracle). The exact form
    * shuffles every value; at 100 TB use [[approxQuantiles]].
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      // ONE value buffer serving all three cut points — three separate
      // percentile() aggs would each hold a full copy of the group
      .agg(percentile(col("l_extendedprice"),
        array(lit(0.5), lit(0.95), lit(0.99))).as("ps"))
      .select(
        col("l_returnflag"),
        element_at(col("ps"), 1).as("p50"),
        element_at(col("ps"), 2).as("p95"),
        element_at(col("ps"), 3).as("p99"))
      .orderBy(col("l_returnflag"))

  /** Sketch-based quantiles (Greenwald-Khanna style, mergeable map-side):
    * the constant-memory scale path; spec bounds rank error vs exact.
    */
  def approxQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50_approx"))
      .orderBy(col("l_returnflag"))

  /** Driver-checkable HLL audit: the sketch's value can't be recomputed
    * by another engine, but its ACCURACY CONTRACT can be pinned — emit
    * the exact distinct count (DuckDB recomputes it) plus a boolean
    * holding the sketch to ≤5% relative error (rsd=0.01 typically lands
    * within 2%). A sketch regression flips the boolean and fails the
    * hash gate.
    *
    * The two counts run as SEPARATE single-pass aggregates joined at one
    * row — NOT one `agg(countDistinct, approx_count_distinct)`: mixing a
    * distinct aggregate with a non-distinct one triggers Catalyst's
    * distinct-rewrite, whose first stage groups by the distinct key and
    * carries the OTHER aggregate's buffer per group — here an ~12 KB HLL
    * register array (rsd=0.01) per distinct l_partkey, ~1 GB of buffer
    * churn at sf0.1 and unboundedly worse at scale. Split, the sketch
    * merges map-side in constant memory and the exact count keeps its
    * usual two-stage shape (the full-key shuffle is the audit's inherent
    * price — at 100 TB run this audit on a sampled partition subset).
    */
  def approxDistinctAudited(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val exact = li.agg(countDistinct(col("l_partkey")).as("n_distinct_exact"))
    val approx = li.agg(approx_count_distinct(col("l_partkey"), rsd = 0.01).as("approx"))
    exact.crossJoin(broadcast(approx))
      .select(col("n_distinct_exact"),
        (abs(col("approx") - col("n_distinct_exact")).cast("double") <=
          col("n_distinct_exact").cast("double") * lit(0.05)).as("approx_ok"))
  }

  /** Driver-checkable GK audit: per group, the returned p50's EXACT rank
    * (values strictly below / at-or-below it) must sit within the
    * sketch's ε-rank guarantee around 0.5·N (ε=1e-4 at accuracy 10000,
    * ±1 row of ceil slack). Group sizes are DuckDB-recomputed; the rank
    * invariant is the boolean. The approx value itself never leaves the
    * plan, so no cross-engine sketch reproduction is needed.
    */
  def approxQuantilesAudited(spark: SparkSession, dir: String): DataFrame = {
    val eps = 1e-4
    val li = Tables.lineitem(spark, dir).select(col("l_returnflag"), col("l_extendedprice"))
    val approx = li.groupBy(col("l_returnflag"))
      .agg(approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000)).as("a"))
    li.join(broadcast(approx), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_vals"),
        sum(when(col("l_extendedprice") < col("a"), 1L).otherwise(0L)).as("lo"),
        sum(when(col("l_extendedprice") <= col("a"), 1L).otherwise(0L)).as("hi"))
      .select(col("l_returnflag"), col("n_vals"),
        ((col("lo").cast("double") <= (lit(0.5) + lit(eps)) * col("n_vals") + lit(1.0)) &&
          (col("hi").cast("double") >= (lit(0.5) - lit(eps)) * col("n_vals") - lit(1.0)))
          .as("p50_rank_ok"))
      .orderBy(col("l_returnflag"))
  }

  def havingFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 40)
      .orderBy(col("l_partkey"))

  /** TPC-H Q1-shaped pricing summary (multi-aggregate + filter + sort). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))).cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) * (one + dec(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q6-shaped filter → global agg; predicates all push to parquet. */
  def filterAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double").as("revenue"))

  /** Star join: fact + two broadcast dims, grouped rollup per region/nation. */
  def starJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(dec(col("c_acctbal"))).cast("double").as("sum_acctbal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Fact⋈fact shuffle join + agg + deterministic top-N. */
  def revenueTopN(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "O")
    val l = Tables.lineitem(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Window rank: top-3 customers by balance per nation (deterministic
    * tiebreak on key). One shuffle on the partition key.
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_nationkey"), col("rk"), col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_nationkey"), col("rk"))
  }

  /** Date/time battery over the event stream table
    * (DiskBasedTransformJob.scala:51-67's function set, normalized).
    */
  def dateTimeBattery(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        year(col("ts")).as("yy"),
        month(col("ts")).as("mo"),
        dayofmonth(col("ts")).as("dd"),
        hour(col("ts")).as("hh"),
        minute(col("ts")).as("mi"),
        date_trunc("month", col("ts")).cast("date").as("month_start"),
        unix_timestamp(col("ts")).as("epoch_s"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour_bucket"))
      .orderBy(col("event_id"))

  /** Anti join: customers with no finalized ('F') order. The filter lands
    * on the build side BEFORE the anti join, so the probe scan streams; at
    * fact scale Catalyst picks shuffled hash anti join, AQE de-skews.
    */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Rollup (grouping sets) over flag/status; NULL grouping levels are
    * COALESCEd to a sentinel so ordering is total and engine-portable.
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("cnt"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** CUBE grouping sets (all four dimension combinations of status ×
    * priority): one pass, Expand + partial agg. The 'ALL' markers come
    * from GROUPING() — coalescing the dimension itself would conflate a
    * real NULL data value with the super-aggregate row (duplicate keys,
    * non-total ordering); GROUPING() distinguishes them exactly, in both
    * engines.
    */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).as("__gs"),
        grouping(col("o_orderpriority")).as("__gp"),
        count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .select(
        when(col("__gs") === 1, lit("ALL")).otherwise(col("o_orderstatus")).as("status"),
        when(col("__gp") === 1, lit("ALL")).otherwise(col("o_orderpriority")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))

  /** Fixed-value pivot (long→wide): per-source document counts spread
    * over the language columns as EXPLICIT conditional aggregates — one
    * map-side-partial groupBy, no second shuffle, deterministic output
    * columns. (`Dataset.pivot(col, values)` compiles to the two-shuffle
    * PivotFirst plan even with fixed values; the conditional-aggregate
    * spelling is the single-shuffle one and mirrors the oracle SQL
    * exactly.)
    */
  def pivotCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(when(col("lang") === "de", 1)).as("de"),
        count(when(col("lang") === "en", 1)).as("en"),
        count(when(col("lang") === "es", 1)).as("es"),
        count(when(col("lang") === "fr", 1)).as("fr"),
        count(when(col("lang") === "zh", 1)).as("zh"))
      .orderBy(col("source"))

  val ops: Seq[Op] = Seq(
    Op("q_cube", cubeAgg,
      Some("""
        SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
                    ELSE o_orderstatus END AS status,
               CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
                    ELSE o_orderpriority END AS priority,
               count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),
    Op("q_pivot", pivotCounts,
      Some("""
        SELECT source,
          count(CASE WHEN lang = 'de' THEN 1 END) AS de,
          count(CASE WHEN lang = 'en' THEN 1 END) AS en,
          count(CASE WHEN lang = 'es' THEN 1 END) AS es,
          count(CASE WHEN lang = 'fr' THEN 1 END) AS fr,
          count(CASE WHEN lang = 'zh' THEN 1 END) AS zh
        FROM documents GROUP BY source ORDER BY source""")),
    Op("q_count", scanCount,
      Some("SELECT COUNT(*) AS n_rows FROM lineitem")),
    Op("q_group_count", groupCount,
      Some("SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey ORDER BY l_partkey")),
    Op("q_distinct", distinctCount,
      Some("SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct FROM lineitem")),
    // sketch-based: engines' HLL/GK implementations differ → spec-checked
    // error bounds instead of hash oracles
    Op("q_distinct_approx", approxDistinctAudited,
      Some("""
        SELECT count(DISTINCT l_partkey) AS n_distinct_exact, true AS approx_ok
        FROM lineitem""")),
    Op("q_quantile_approx", approxQuantilesAudited,
      Some("""
        SELECT l_returnflag, count(*) AS n_vals, true AS p50_rank_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),
    Op("q_percentile", percentiles,
      Some("""
        SELECT l_returnflag,
          quantile_cont(l_extendedprice, 0.5) AS p50,
          quantile_cont(l_extendedprice, 0.95) AS p95,
          quantile_cont(l_extendedprice, 0.99) AS p99
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),
    Op("q_having", havingFilter,
      Some("SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 40 ORDER BY l_partkey")),
    Op("q1_agg", pricingSummary,
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4)))) AS DOUBLE) AS sum_charge,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),
    Op("q_filter_agg", filterAgg,
      Some("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_quantity < 24""")),
    Op("q_join_star", starJoin,
      Some("""
        SELECT r_name, n_name, COUNT(*) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),
    Op("q_join_topn", revenueTopN,
      Some("""
        SELECT o_orderkey,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'O'
        GROUP BY o_orderkey
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10""")),
    Op("q_window", windowRank,
      Some("""
        SELECT c_nationkey, rk, c_custkey, c_name, c_acctbal FROM (
          SELECT c_nationkey, c_custkey, c_name, c_acctbal,
            CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rk
          FROM customer) t
        WHERE rk <= 3
        ORDER BY c_nationkey, rk""")),
    Op("q_datetime", dateTimeBattery,
      Some("""
        SELECT event_id,
          CAST(EXTRACT(YEAR FROM ts) AS INT) AS yy,
          CAST(EXTRACT(MONTH FROM ts) AS INT) AS mo,
          CAST(EXTRACT(DAY FROM ts) AS INT) AS dd,
          CAST(EXTRACT(HOUR FROM ts) AS INT) AS hh,
          CAST(EXTRACT(MINUTE FROM ts) AS INT) AS mi,
          CAST(date_trunc('month', ts) AS DATE) AS month_start,
          CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS epoch_s,
          strftime(ts, '%Y-%m-%d %H') AS hour_bucket
        FROM events
        ORDER BY event_id""")),
    Op("q_anti_join", antiJoin,
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        ORDER BY c_custkey""")),
    Op("q_rollup", rollupAgg,
      Some("""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS cnt
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus"""))
  )
}
