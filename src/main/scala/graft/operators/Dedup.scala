package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables

/** Deduplication operators over the `documents` table — the exactness
  * ladder a training-data pipeline needs: exact (content hash), then
  * near-dup families (MinHash-LSH, SimHash, n-gram Jaccard, embedding
  * cosine) built on the same shingle/signature primitives.
  *
  * Scale design: every dedup shuffles a FIXED-WIDTH key (128-bit digest,
  * 64-bit band hash), never the document text itself; candidate pairs are
  * generated only within LSH buckets, O(n·bands) shuffle rows instead of
  * O(n²) comparisons.
  */
object Dedup {

  /** Exact dedup, keep-first: group documents by a 128-bit content digest
    * (md5) so the shuffle carries 32 bytes per row instead of the full
    * text; survivor is the lowest doc_id. Equivalent to GROUP BY text
    * (collision probability ~n²/2¹²⁹).
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("digest"))
      .agg(
        min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))

  val ops: Seq[Op] = Seq(
    Op("q_dedup_exact", exact,
      Some("""
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY text ORDER BY doc_id"""))
  )
}
