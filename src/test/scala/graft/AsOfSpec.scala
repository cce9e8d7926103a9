package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asof join picks most recent right row per key, inclusive at ties") {
    val left = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L),
      (1L, t("2024-01-01 12:00:00"), 101L),
      (1L, t("2024-01-01 09:00:00"), 102L), // before any right row
      (2L, t("2024-01-01 10:00:00"), 200L)  // key with no right rows
    ).toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, t("2024-01-01 10:00:00"), 9100L), // tie with event 100 → inclusive
      (1L, t("2024-01-01 11:00:00"), 9110L)
    ).toDF("user_id", "ts", "pay")

    val got = AsOf.asofJoin(left, right, "user_id", "ts", Seq("pay"))
      .select("event_id", "asof_pay").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap

    assert(got(100L) == Some(9100L), "equal-ts right row must match (inclusive)")
    assert(got(101L) == Some(9110L), "most recent right row wins")
    assert(got(102L) == None, "nothing before the first right row")
    assert(got(200L) == None, "keys with no right rows carry null")
  }

  test("click attribution matches self-click and never attributes forward") {
    val rows = AsOf.clickAttribution(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val eid = r.getLong(0)
      if (ev(eid)._1 == "click") {
        assert(!r.isNullAt(1), s"a click must attribute to itself or a tie: $r")
      }
      if (!r.isNullAt(2)) {
        assert(r.getLong(2) <= ev(eid)._2, s"attributed click cannot be in the future: $r")
      }
    }
  }
}
