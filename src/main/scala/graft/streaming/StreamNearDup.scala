package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.Op
import graft.operators.Dedup
import graft.sources.Tables

/** Near-duplicate detection ON INGEST — the streaming spelling of the
  * MinHash-LSH batch pipeline: documents arrive in micro-batches, each
  * doc's band hashes come from ONE codegen'd stateless projection
  * ([[graft.operators.Dedup.minHashBandsCol]] — no signature aggregate,
  * no (doc, shingle) shuffle), and a per-bucket state store accumulates
  * the bucket's member ids so every new doc pairs against ALL history,
  * across batch boundaries. The batch pipeline's bucket cap applies to
  * the STATE (lowest ids survive — bounded state per bucket, the same
  * O(b²) guard), so state volume is bounded by bucket count, not stream
  * age. Candidates then pass the exact-Jaccard verify, making arrival
  * order irrelevant to the final pair set.
  *
  * 100 TB shape: state per bucket is capped ids only (≤ 512 longs);
  * candidates stream out as slim (doc_a, doc_b) rows; the expensive
  * verify runs over candidates, never the corpus square. This is the
  * continuous-corpus complement of [[graft.operators.Dedup]]'s
  * `incrementalAgainstCorpus` (batch probes a static corpus; this keeps
  * the corpus itself rolling forward).
  */
object StreamNearDup {

  private val stagedInputs = new ConcurrentHashMap[String, String]()

  /** Documents staged as 4 doc-id-range parquet files (ascending ranges
    * in file-name order, so the file source replays them oldest-ids
    * first — the arrival order a backfill produces).
    */
  private def stagedDocsDir(spark: SparkSession, dir: String): String =
    stagedInputs.computeIfAbsent(dir, { _ =>
      val work = graft.Scratch.dir("graft-docs-in")
      Tables.documents(spark, dir)
        .repartitionByRange(4, col("doc_id"))
        .write.mode("overwrite").parquet(s"$work/docs")
      s"$work/docs"
    })

  def nearDupRoundTrip(spark: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    import spark.implicits._
    val staged = stagedDocsDir(spark, dir)
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val banded = stream.select(col("doc_id"),
        posexplode(Dedup.minHashBandsCol(col("text"))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")
      .select(col("band_id").cast("int"), col("band_hash"), col("doc_id"))
      .as[(Int, Long, Long)]
    val cap = Dedup.BucketCap
    val pairs = banded
      .groupByKey { case (band, hash, _) => (band, hash) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), rows: Iterator[(Int, Long, Long)],
            state: GroupState[Array[Long]]) => {
          val seen = state.getOption.getOrElse(Array.empty[Long])
          val fresh = rows.map(_._3).toArray.distinct.sorted
            .filterNot(seen.contains)
          if (fresh.isEmpty) Iterator.empty
          else {
            // lowest-id bucket cap on the STATE — bounded O(b²) pairs per
            // bucket and bounded state, mirroring the batch capBuckets
            val merged = (seen ++ fresh).sorted.take(cap)
            state.update(merged)
            val keptNew = fresh.filter(merged.contains)
            val out = Seq.newBuilder[(Long, Long)]
            for (n <- keptNew) {
              for (o <- seen if merged.contains(o))
                out += ((math.min(o, n), math.max(o, n)))
              for (o <- keptNew if o < n) out += ((o, n))
            }
            out.result().iterator
          }
        })
      .toDF("doc_a", "doc_b")
    val sink = graft.Scratch.dir("graft-neardup-stream") + "/pairs"
    val q = StreamTuning.withStatePartitions(spark, 4) {
      pairs.writeStream
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", StreamTuning.scratchDir("graft-ndstream-ckpt"))
        .trigger(Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    // exact-Jaccard verify over the streamed candidate set: the final
    // pair set is threshold-exact regardless of arrival order
    val candidates = spark.read.parquet(sink).distinct()
    Dedup.verifyCandidates(Tables.documents(spark, dir), candidates, threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val ops: Seq[Op] = Seq(
    Op("q_stream_neardup", (s, d) => nearDupRoundTrip(s, d),
      Some(s"""
        WITH ${Dedup.ExactPairsCtes}
        SELECT doc_a, doc_b, jaccard FROM pairs ORDER BY doc_a, doc_b""")))
}
