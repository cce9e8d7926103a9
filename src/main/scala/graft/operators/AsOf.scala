package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables

/** Point-in-time (as-of) join: for each left row, the most recent right
  * row with the same key and `right.ts <= left.ts` — the lookup shape
  * feature stores and event-attribution pipelines need, and one Spark has
  * no native operator for.
  *
  * Spark-first construction (option (a) of the custom-op ladder —
  * composition, no custom physical operator needed): tag both sides, take
  * the time-sorted UNION, and carry the right side's payload forward with
  * a running `last(ignoreNulls)` window. At equal timestamps the right row
  * sorts first (kind desc), making the match inclusive. Cost: ONE shuffle
  * per side on the join key and a single sorted pass — never the O(left ×
  * right-per-key) blowup of the naive range-join formulation; skew is
  * bounded by the busiest key, same as any keyed window.
  *
  * The oracle is DuckDB's native ASOF JOIN, so the semantics are checked
  * against an independent first-class implementation.
  */
object AsOf {

  /** Generic as-of: `left` gains `right`'s payload columns from the most
    * recent right row per key. `right` must be unique per (key, ts) —
    * pre-aggregate it if not (see [[clickAttribution]]).
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, payload: Seq[String]): DataFrame = {
    val leftTagged = payload.foldLeft(
      left.withColumn("kind", lit(0))) { (df, p) =>
      df.withColumn(p, lit(null).cast(right.schema(p).dataType))
    }
    val rightTagged = left.columns.filterNot(c => c == key || c == ts)
      .foldLeft(right.withColumn("kind", lit(1))) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("kind").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the latest right ROW atomically: last(ignoreNulls) over a
    // struct that is non-null exactly on right rows. Carrying each
    // payload column separately would skip genuinely-NULL payload values
    // (inheriting a STALE older row's value) and could even mix fields
    // from different right rows.
    val carried = leftTagged.unionByName(rightTagged)
      .withColumn("__asof_row", last(
        when(col("kind") === 1, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))
    payload.foldLeft(carried) { (df, p) =>
      df.withColumn(s"asof_$p", col(s"__asof_row.$p"))
    }
      .filter(col("kind") === 0)
      .drop("kind", "__asof_row")
      .drop(payload: _*)
  }

  /** Every event joined as-of to the user's most recent click (inclusive):
    * the attribution query. Clicks are deduped to one per (user, ts) with
    * a deterministic winner so both engines resolve ties identically.
    */
  def clickAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_event_id"))
      .withColumn("click_us", unix_micros(col("ts")))
      .select(col("user_id"), col("ts"), col("click_event_id"), col("click_us"))
    asofJoin(
        ev.select(col("user_id"), col("ts"), col("event_id")),
        clicks, key = "user_id", ts = "ts",
        payload = Seq("click_event_id", "click_us"))
      .select(col("event_id"),
        col("asof_click_event_id").as("asof_click_id"),
        col("asof_click_us"))
      .orderBy(col("event_id"))
  }

  val ops: Seq[Op] = Seq(
    Op("q_asof", clickAttribution,
      Some("""
        WITH clicks AS (
          SELECT user_id, ts, max(event_id) AS click_event_id
          FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
        SELECT e.event_id,
               c.click_event_id AS asof_click_id,
               CAST(epoch_us(c.ts) AS BIGINT) AS asof_click_us
        FROM events e ASOF LEFT JOIN clicks c
          ON e.user_id = c.user_id AND e.ts >= c.ts
        ORDER BY e.event_id"""))
  )
}
