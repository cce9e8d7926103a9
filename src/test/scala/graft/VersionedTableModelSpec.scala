package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.VersionedTable

/** Model-based check of the transaction-log machinery: a seeded random
  * sequence of write/append/upsert/delete/optimize ops runs against BOTH
  * the real table and a trivial in-memory model of the semantics; after
  * every op the live snapshot must equal the model, and at the end every
  * HISTORICAL version must equal the model's recorded history — time
  * travel is only trustworthy if it holds under arbitrary interleavings,
  * not just the spec's hand-picked ones.
  */
class VersionedTableModelSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  private type Model = Map[(String, Long), Long] // (partition, key) -> v

  test("random op sequences: every snapshot equals the semantic model") {
    val rnd = new scala.util.Random(20260812L)
    val t = Files.createTempDirectory("graft-vt-model").toFile.getAbsolutePath + "/t"
    val parts = Vector("a", "b", "c")
    var model: Model = Map.empty
    val history = scala.collection.mutable.ArrayBuffer[(Long, Model)]()
    var expiredBelow = 0L // versions below this were expired from the log

    def rows(n: Int): Seq[(Long, String, Long)] =
      Seq.fill(n)((rnd.nextInt(12).toLong, parts(rnd.nextInt(parts.size)), rnd.nextInt(1000).toLong))

    def df(rs: Seq[(Long, String, Long)]) = rs.toDF("k", "p", "v")

    def applyUpsert(m: Model, rs: Seq[(Long, String, Long)]): Model =
      rs.groupBy(r => (r._2, r._1)).foldLeft(m) { case (acc, ((p, k), group)) =>
        // highest v wins within the batch AND against the base (ties: update wins)
        val best = group.map(_._3).max
        acc.get((p, k)) match {
          case Some(old) if old > best => acc
          case _ => acc.updated((p, k), best)
        }
      }

    // v1 must exist before the loop (upsert bootstraps, read needs data).
    // Plain write has no key semantics — dedupe the frame so the model
    // (a map) describes it exactly.
    val first = rows(6).groupBy(r => (r._2, r._1)).map(_._2.head).toSeq
    VersionedTable.write(spark, t, df(first), Seq("p"))
    model = first.map(r => (r._2, r._1) -> r._3).toMap
    history += VersionedTable.latestVersion(spark, t) -> model

    var lastVersion = VersionedTable.latestVersion(spark, t)
    (1 to 18).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => // append of brand-new keys only (append has no key semantics)
          val fresh = rows(3).map(r => (r._1 + 100 + step * 100, r._2, r._3))
            .groupBy(r => (r._2, r._1)).map(_._2.head).toSeq
          VersionedTable.write(spark, t, df(fresh), Seq("p"), mode = "append")
          model = model ++ fresh.map(r => (r._2, r._1) -> r._3)
        case 1 | 2 => // keyed upsert, latest-wins
          val ups = rows(4).map(r => (r._1, r._2, r._3 + step * 100))
          val dedup = ups.groupBy(r => (r._2, r._1)).map(_._2.maxBy(_._3)).toSeq
          VersionedTable.upsert(spark, t, df(dedup),
            key = "k", precombine = "v", partitionCols = Seq("p"))
          model = applyUpsert(model, dedup)
        case 3 => // predicate delete on a random key (may match nothing)
          val k = rnd.nextInt(12).toLong
          VersionedTable.delete(spark, t, col("k") === k, Seq("p"))
          model = model.filterNot(_._1._2 == k)
      }
      // a no-match delete creates no commit; record history per COMMIT
      val nowVersion = VersionedTable.latestVersion(spark, t)
      if (nowVersion > lastVersion) { history += nowVersion -> model; lastVersion = nowVersion }
      if (rnd.nextInt(5) == 0) {
        VersionedTable.optimize(spark, t, maxFilesPerPartition = 2)
        lastVersion = VersionedTable.latestVersion(spark, t)
        // no model change — optimize must be invisible
      }
      if (rnd.nextInt(6) == 0) {
        // log retention interleaves too: surviving snapshots unaffected,
        // expired versions tracked for the final history walk
        val gone = VersionedTable.expireLog(spark, t, keepVersions = 12)
        if (gone.nonEmpty) expiredBelow = math.max(expiredBelow, gone.max + 1)
      }
      if (model.nonEmpty) {
        val got = VersionedTable.read(spark, t)
          .select("p", "k", "v").as[(String, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        assert(got == model, s"live snapshot diverged at step $step")
      }
    }

    // historical versions: optimize commits interleave, so walk the real
    // history and compare each non-empty recorded model against its
    // data-changing commit's version
    val hist = VersionedTable.history(spark, t)
      .select("version", "op").as[(Long, String)].collect().sortBy(_._1)
    val dataVersions = hist.filter(_._2 != "optimize").map(_._1)
    assert(dataVersions.toSet == history.map(_._1).filter(_ >= expiredBelow).toSet,
      s"surviving data commits must match the recorded model versions")
    history.filter(_._2.nonEmpty).take(25).foreach { case (v, m) =>
      if (v < expiredBelow) {
        // expired versions must fail cleanly, never read wrong data
        intercept[IllegalArgumentException](
          VersionedTable.read(spark, t, asOfVersion = Some(v)).collect())
      } else {
        // a snapshot AT an optimize boundary equals the preceding data
        // state; reading the data version itself is exact
        val got = VersionedTable.read(spark, t, asOfVersion = Some(v))
          .select("p", "k", "v").as[(String, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        assert(got == m, s"time travel to v$v diverged")
      }
    }
  }
}
