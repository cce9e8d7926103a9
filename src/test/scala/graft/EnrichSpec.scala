package graft

import org.apache.spark.sql.functions._

import graft.operators.Enrich

class EnrichSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  test("parseEventTime accepts every declared format; garbage gives null") {
    val rows = Seq(
      "2024-03-01T10:20:30Z",
      "2024-03-01 10:20:30",
      "2024/03/01 10:20:30",
      "2024-03-01",
      "not a timestamp",
      "").toDF("s")
      .select(Enrich.parseEventTime(col("s")).as("ts"))
      .collect()
    val parsed = rows.map(r => Option(r.getTimestamp(0)))
    assert(parsed.take(3).forall(_.exists(_.toString == "2024-03-01 10:20:30.0")))
    assert(parsed(3).exists(_.toString == "2024-03-01 00:00:00.0"))
    assert(parsed(4).isEmpty && parsed(5).isEmpty)
  }

  test("ingest stamp is read per task: later actions restamp, one plan reuses its source") {
    val df = Seq(1L, 2L, 3L).toDF("k").coalesce(1)
      .withColumn("ingest_ts", org.apache.spark.sql.GraftShim.column(
        graft.functions.StableStamp()))
    def stamps() = df.select("ingest_ts").collect().map(_.getTimestamp(0).getTime)
    val a = stamps()
    assert(a.distinct.length == 1, "rows of one task share one stamp")
    Thread.sleep(5)
    val b = stamps()
    assert(b.head > a.head,
      "a later action must stamp its own time, not a construction-time constant")
  }

  test("deterministicUuid is stable, uuid-shaped, and key-sensitive") {
    val rows = Seq((1L, "a"), (1L, "a"), (2L, "a"), (1L, "b"))
      .toDF("k1", "k2")
      .select(Enrich.deterministicUuid(col("k1"), col("k2")).as("u"))
      .collect().map(_.getString(0))
    assert(rows(0) == rows(1), "same key, same id")
    assert(rows(0) != rows(2) && rows(0) != rows(3), "different key, different id")
    assert(rows.forall(_.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
  }
}
