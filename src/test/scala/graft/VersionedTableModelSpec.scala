package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.VersionedTable

/** Model-based check of the transaction-log machinery: a seeded random
  * sequence of write/append/upsert/delete/upsertMOR/deleteMOR/compact/
  * optimize/expire ops runs against BOTH the real table and a trivial
  * in-memory model of the semantics; after every op the live snapshot
  * must equal the model, and at the end every HISTORICAL version must
  * equal the model's recorded history — time travel is only trustworthy
  * if it holds under arbitrary interleavings, not just the spec's
  * hand-picked ones.
  *
  * Model semantics mirror the MOR collapse: per (partition, key) the
  * winner is the highest precombine, ties to the LATER commit; a winning
  * tombstone hides the key; compaction materializes deletions and
  * forgets tombstones (a later COW insert of the key wins regardless).
  */
class VersionedTableModelSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  // (partition, key) -> (precombine, isTombstone)
  private type Model = Map[(String, Long), (Long, Boolean)]
  private def visible(m: Model): Map[(String, Long), Long] =
    m.collect { case (k, (v, false)) => k -> v }

  test("random op sequences: every snapshot equals the semantic model") {
    runSequence(20260813L)
  }

  test("random op sequences: second seed (different op interleaving)") {
    runSequence(424242L)
  }

  private def runSequence(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val t = Files.createTempDirectory("graft-vt-model").toFile.getAbsolutePath + "/t"
    val parts = Vector("a", "b", "c")
    var model: Model = Map.empty
    val history = scala.collection.mutable.ArrayBuffer[(Long, Map[(String, Long), Long])]()
    var expiredBelow = 0L // versions below this were expired from the log
    var deltasLive = false

    def rows(n: Int): Seq[(Long, String, Long)] =
      Seq.fill(n)((rnd.nextInt(12).toLong, parts(rnd.nextInt(parts.size)), rnd.nextInt(1000).toLong))

    def df(rs: Seq[(Long, String, Long)]) = rs.toDF("k", "p", "v")

    // highest precombine wins, ties to the NEW (later) commit — the
    // collapse order (precombine DESC, commit DESC)
    def applyMor(m: Model, rs: Seq[(Long, String, Long)], tomb: Boolean): Model =
      rs.groupBy(r => (r._2, r._1)).foldLeft(m) { case (acc, ((p, k), group)) =>
        val best = group.map(_._3).max
        acc.get((p, k)) match {
          case Some((old, _)) if old > best => acc
          case _ => acc.updated((p, k), (best, tomb))
        }
      }

    var lastVersion = 0L
    def compactNow(): Unit = {
      VersionedTable.compactDeltas(spark, t)
      // compaction materializes deletions: tombstones are forgotten
      model = model.filter(!_._2._2)
      deltasLive = false
      // the compaction commit is invisible — absorb its version so the
      // history walk only records data commits
      lastVersion = VersionedTable.latestVersion(spark, t)
    }

    // v1 must exist before the loop (upsert bootstraps, read needs data).
    // Plain write has no key semantics — dedupe the frame so the model
    // (a map) describes it exactly.
    val first = rows(6).groupBy(r => (r._2, r._1)).map(_._2.head).toSeq
    VersionedTable.write(spark, t, df(first), Seq("p"))
    model = first.map(r => (r._2, r._1) -> (r._3, false)).toMap
    history += VersionedTable.latestVersion(spark, t) -> visible(model)

    lastVersion = VersionedTable.latestVersion(spark, t)
    (1 to 24).foreach { step =>
      rnd.nextInt(6) match {
        case 0 => // append of brand-new keys only (append has no key semantics)
          val fresh = rows(3).map(r => (r._1 + 100 + step * 100, r._2, r._3))
            .groupBy(r => (r._2, r._1)).map(_._2.head).toSeq
          VersionedTable.write(spark, t, df(fresh), Seq("p"), mode = "append")
          model = model ++ fresh.map(r => (r._2, r._1) -> (r._3, false))
        case 1 => // keyed COW upsert, latest-wins (needs a compacted table)
          if (deltasLive) compactNow()
          val ups = rows(4).map(r => (r._1, r._2, r._3 + step * 100))
          val dedup = ups.groupBy(r => (r._2, r._1)).map(_._2.maxBy(_._3)).toSeq
          VersionedTable.upsert(spark, t, df(dedup),
            key = "k", precombine = "v", partitionCols = Seq("p"))
          model = applyMor(model, dedup, tomb = false)
        case 2 => // MOR delta upsert, same latest-wins semantics
          val ups = rows(4).map(r => (r._1, r._2, r._3 + step * 100))
          val dedup = ups.groupBy(r => (r._2, r._1)).map(_._2.maxBy(_._3)).toSeq
          VersionedTable.upsertMOR(spark, t, df(dedup),
            key = "k", precombine = "v", partitionCols = Seq("p"))
          model = applyMor(model, dedup, tomb = false)
          deltasLive = true
        case 3 => // predicate delete on a random key (may match nothing)
          if (deltasLive) compactNow()
          val k = rnd.nextInt(12).toLong
          VersionedTable.delete(spark, t, col("k") === k, Seq("p"))
          model = model.filterNot(_._1._2 == k)
        case 4 => // MOR tombstone delete: outranks lower precombines only
          val dels = rows(3).map(r => (r._1, r._2, r._3 + step * 100))
            .groupBy(r => (r._2, r._1)).map(_._2.maxBy(_._3)).toSeq
          VersionedTable.deleteMOR(spark, t, df(dels),
            key = "k", precombine = "v", partitionCols = Seq("p"))
          model = applyMor(model, dels, tomb = true)
          deltasLive = true
        case 5 => // explicit compaction: invisible to the merged state
          if (deltasLive) compactNow()
          else { // exercise the no-delta fast path too
            VersionedTable.compactDeltas(spark, t)
          }
      }
      // only DATA-changing commits record history (no-match deletes and
      // no-delta compactions create no commit; compactions are invisible)
      val nowVersion = VersionedTable.latestVersion(spark, t)
      if (nowVersion > lastVersion) {
        history += nowVersion -> visible(model)
        lastVersion = nowVersion
      }
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
      if (visible(model).nonEmpty) {
        val got = VersionedTable.read(spark, t)
          .select("p", "k", "v").as[(String, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        assert(got == visible(model), s"live snapshot diverged at step $step")
      }
    }

    // historical versions: optimize/compaction commits interleave, so walk
    // the real history and compare each non-empty recorded model against
    // its data-changing commit's version. Compactions record history when
    // they changed nothing visible — exclude their versions, like optimize.
    val hist = VersionedTable.history(spark, t)
      .select("version", "op").as[(Long, String)].collect().sortBy(_._1)
    val dataVersions = hist
      .filter(h => h._2 != "optimize" && h._2 != "compact_deltas").map(_._1)
    assert(dataVersions.toSet == history.map(_._1).filter(_ >= expiredBelow).toSet,
      s"surviving data commits must match the recorded model versions")
    history.filter(_._2.nonEmpty).take(30).foreach { case (v, m) =>
      if (v < expiredBelow) {
        // expired versions must fail cleanly, never read wrong data
        intercept[IllegalArgumentException](
          VersionedTable.read(spark, t, asOfVersion = Some(v)).collect())
      } else {
        // a snapshot AT an optimize/compaction boundary equals the
        // preceding data state; reading the data version itself is exact
        val got = VersionedTable.read(spark, t, asOfVersion = Some(v))
          .select("p", "k", "v").as[(String, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        assert(got == m, s"time travel to v$v diverged")
      }
    }
  }
}
