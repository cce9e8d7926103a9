package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.PartitionTransforms
import graft.sinks.PartitionTransforms.{Bucket, Day, TruncateNum, TruncateStr}
import graft.sources.Tables

class PartitionTransformsSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  test("bucket pruning with analyzer-cast literals stays type-exact") {
    val out = Files.createTempDirectory("graft-pt-cast").toFile.getAbsolutePath + "/t"
    val df = (0L until 100L).map(k => (k, k)).toDF("k", "v")
    val ts = Seq(Bucket("k", 8))
    PartitionTransforms.write(spark, out, df, ts)
    // INT literal against the BIGINT bucket column: the analyzer's cast
    // must ride into the bucket hash — unwrapping it hashes 5:int where
    // the dirs hashed 5:bigint and silently loses the row
    val got = PartitionTransforms.read(spark, out, ts, col("k") === 5)
    assert(got.select("v").as[Long].collect().toSeq == Seq(5L))
    val got2 = PartitionTransforms.read(spark, out, ts, col("k").isin(5, 17))
    assert(got2.select("k").as[Long].collect().sorted.toSeq == Seq(5L, 17L))
    // a CAST on the column side blocks the implication (conservative scan)
    val got3 = PartitionTransforms.read(spark, out, ts,
      col("k").cast("int") === 5)
    assert(got3.select("v").as[Long].collect().toSeq == Seq(5L))
  }

  test("hidden partitioning: raw predicates prune transform partitions") {
    val out = Files.createTempDirectory("graft-pt").toFile.getAbsolutePath + "/t"
    val ev = Tables.events(spark, sf)
    val ts = Seq(Day("ts"), Bucket("user_id", 8))
    PartitionTransforms.write(spark, out, ev, ts)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("__p_ts=")), dirs.take(3).mkString(","))

    val pred = col("ts") >= lit("2024-01-10") && col("ts") < lit("2024-01-12") &&
      col("user_id") === 7L
    val got = PartitionTransforms.read(spark, out, ts, pred)
    val want = ev.filter(pred)
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.columns.toSet == ev.columns.toSet, "derived cols dropped")

    val plan = got.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*".r.findFirstIn(plan).getOrElse("")
    assert(pf.contains("__p_ts"), s"day pruning missing: $pf")
    assert(pf.contains("__p_user_id"), s"bucket pruning missing: $pf")
  }

  test("range maps through monotone transforms; bucket ignores ranges; OR needs both sides") {
    val out = Files.createTempDirectory("graft-pt2").toFile.getAbsolutePath + "/t"
    val df = (0L until 1000L).map(k => (k, f"cat${k % 30}%03d", k % 10)).toDF("k", "name", "g")
    val ts = Seq(TruncateNum("k", 100L), TruncateStr("name", 4))
    PartitionTransforms.write(spark, out, df, ts)

    def planOf(pred: org.apache.spark.sql.Column) =
      "PartitionFilters: \\[[^\\]]*".r.findFirstIn(
        PartitionTransforms.read(spark, out, ts, pred)
          .queryExecution.executedPlan.toString).getOrElse("")

    // numeric range → truncate-bucket range
    assert(planOf(col("k") >= 250L && col("k") < 400L).contains("__p_k"))
    // string equality → prefix partition
    assert(planOf(col("name") === "cat007").contains("__p_name"))
    // OR of two prunable sides prunes; OR with an unprunable side doesn't
    assert(planOf(col("k") === 10L || col("k") === 910L).contains("__p_k"))
    assert(!planOf(col("k") === 10L || col("g") === 3L).contains("__p_k"))
    // correctness across all shapes
    Seq(
      col("k") >= 250L && col("k") < 400L,
      col("name") === "cat007",
      col("k") === 10L || col("k") === 910L,
      col("k") === 10L || col("g") === 3L,
      col("k").isin(5L, 105L, 205L)
    ).foreach { p =>
      val got = PartitionTransforms.read(spark, out, ts, p).select("k").as[Long].collect().toSet
      val want = df.filter(p).select("k").as[Long].collect().toSet
      assert(got == want, s"mismatch for $p")
    }
  }
}
