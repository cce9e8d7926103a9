package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables

/** Deduplication operators over the `documents` table — the exactness
  * ladder a training-data pipeline needs: exact (content hash), then the
  * near-dup families (MinHash-LSH, SimHash, n-gram Jaccard, embedding
  * cosine) built on shared shingle/signature primitives.
  *
  * Published constructions, pure DataFrame plans (no UDFs):
  *  - MinHash / LSH banding: Broder, "On the resemblance and containment
  *    of documents" (1997); Leskovec-Rajaraman-Ullman, "Mining of Massive
  *    Datasets" ch.3 banding analysis.
  *  - SimHash: Charikar, "Similarity estimation techniques from rounding
  *    algorithms" (2002); block-split candidate generation per
  *    Manku-Jain-Sarma (2007).
  *
  * Scale design (100 TB):
  *  - signatures are computed PER ROW with higher-order functions — the
  *    scan stage is embarrassingly parallel, no shuffle;
  *  - the only shuffles key on (band_id, band_hash) / simhash blocks —
  *    uniform by construction, O(n·bands) rows, never O(n²) pairs;
  *  - candidate pairs exist only within buckets; exact verification
  *    (Jaccard / cosine / hamming) touches candidates, not the corpus.
  */
object Dedup {

  // ---- shared primitives ----

  /** Word 3-shingles of the document, each reduced to a 32-bit hash
    * (nonnegative long), distinct per doc. Documents shorter than the
    * shingle width fall back to one whole-text shingle so every doc has a
    * non-empty set.
    */
  private[graft] def shingleHashes(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val shingles = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3))))
      .otherwise(array(trim(text)))
    array_distinct(transform(shingles, s => xxhash64(s).bitwiseAND(lit(0xFFFFFFFFL))))
  }

  /** P fixed universal-hash permutations (a·x+b mod p, p prime > 2³²,
    * a 31-bit so a·x stays within a signed 64-bit long).
    */
  private val NumPerms = 64
  private val Prime = 4294967311L
  private val (permA, permB) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(NumPerms)(math.abs(rnd.nextInt(Int.MaxValue - 1)) + 1L),
      Array.fill(NumPerms)(math.abs(rnd.nextLong()) % Prime))
  }

  /** MinHash signature: sig[i] = min over shingles of (aᵢ·x+bᵢ mod p).
    * Entirely per-row (HOF over HOF), codegen-friendly, no shuffle.
    */
  private[graft] def minhashSignature(shingles: Column): Column = {
    val perms = arrays_zip(
      typedlit(permA.toSeq).as("a"),
      typedlit(permB.toSeq).as("b"))
    transform(perms, p =>
      array_min(transform(shingles,
        x => pmod(p.getField("a") * x + p.getField("b"), lit(Prime)))))
  }

  private val NumBands = 16
  private val RowsPerBand = NumPerms / NumBands // r=4 → threshold (1/16)^(1/4) ≈ 0.5

  /** (band_id, band_hash) rows for LSH bucketing. */
  private[graft] def bandedSignature(df: DataFrame): DataFrame =
    Tables.spread(df)
      .withColumn("sig", minhashSignature(shingleHashes(col("text"))))
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), lit(NumBands - 1)),
          b => xxhash64(b, call_function("slice", col("sig"), b * RowsPerBand + 1, lit(RowsPerBand))))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")

  /** Candidate near-dup pairs: docs sharing ≥1 LSH bucket (a<b, distinct).
    * The self-join keys on (band_id, band_hash): uniform, bounded buckets.
    */
  private[graft] def candidatePairs(docs: DataFrame): DataFrame = {
    val bands = bandedSignature(docs).alias("l")
    val r = bandedSignature(docs).alias("r")
    bands.join(r,
        col("l.band_id") === col("r.band_id") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** Per-doc neighbor rollup of a pair set → (doc_id, n_candidates,
    * min_neighbor) for EVERY doc (docs with no candidates keep 0/null),
    * so the result is total and deterministic.
    */
  private def neighborSummary(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val sym = pairs.select(col("doc_a").as("doc_id"), col("doc_b").as("neighbor"))
      .union(pairs.select(col("doc_b").as("doc_id"), col("doc_a").as("neighbor")))
    docs.select(col("doc_id"))
      .join(sym, Seq("doc_id"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("neighbor")).as("n_candidates"),
        min(col("neighbor")).as("min_neighbor"))
      .orderBy(col("doc_id"))
  }

  // ---- operators ----

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

  /** MinHash-LSH near-dup discovery: per-doc candidate neighborhood. */
  def minHashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    neighborSummary(docs, candidatePairs(docs))
  }

  /** 64-bit SimHash (Charikar): per token-hash bit i, sum ±1; sign → bit.
    * Near-dup candidates share one of 4 16-bit blocks (pigeonhole: any
    * pair at hamming ≤ 3 shares a block); verified with bit_count(xor)≤3.
    */
  private[graft] def simhash64(text: Column): Column = {
    // Hash each token ONCE, then fold bit columns — hashing inside the
    // per-bit lambda would recompute xxhash 64× per token.
    val tokHashes = transform(
      array_distinct(split(trim(lower(text)), "\\s+")), t => xxhash64(t))
    val counts = aggregate(
      tokHashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          i => when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))),
        (a, b) => a + b))
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  def simHash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
      .withColumn("sh", simhash64(col("text")))
    val blocks = docs.select(col("doc_id"), col("sh"), posexplode(
      transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)))))
      .withColumnRenamed("pos", "block_id").withColumnRenamed("col", "block")
    val pairs = blocks.alias("l").join(blocks.alias("r"),
        col("l.block_id") === col("r.block_id") &&
        col("l.block") === col("r.block") &&
        col("l.doc_id") < col("r.doc_id"))
      .filter(bit_count(col("l.sh").bitwiseXOR(col("r.sh"))) <= 3)
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    neighborSummary(docs, pairs)
  }

  /** Exact n-gram Jaccard verification over the MinHash candidate pairs:
    * the two-stage dedup (cheap LSH recall → exact verify on candidates
    * only). Emits verified pairs with their exact similarity.
    */
  /** Verified pair set (doc_a, doc_b, jaccard ≥ threshold). */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sets = docs.select(col("doc_id"), shingleHashes(col("text")).as("sh"))
    candidatePairs(docs)
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Per-doc rollup of verified neighbors (total over all docs so the
    * result is deterministic and never empty).
    */
  def ngramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = ngramJaccardPairs(docs, threshold)
    val sym = pairs.select(col("doc_a").as("doc_id"), col("jaccard"))
      .union(pairs.select(col("doc_b").as("doc_id"), col("jaccard")))
    docs.select(col("doc_id"))
      .join(sym, Seq("doc_id"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("jaccard")).as("n_verified"),
        coalesce(max(col("jaccard")), lit(0.0)).as("best_jaccard"))
      .orderBy(col("doc_id"))
  }

  /** Embedding-cosine near-dup: random-hyperplane LSH buckets (8 bits) →
    * exact cosine within buckets ≥ threshold → per-vec neighborhood.
    * Scale: signature per row (no shuffle), bucket join keys on one byte
    * of signature × band — O(n·bands); cosine only on candidates.
    */
  def embeddingCosine(spark: SparkSession, dir: String, threshold: Double = 0.9): DataFrame = {
    val vecs = Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id").as("doc_id"), Similarity.normalized(col("embedding")).as("v"))
    val sig = Similarity.hyperplaneSignature(col("v"))
    val banded = vecs.withColumn("sig", sig)
      .select(col("doc_id"), col("v"), posexplode(
        transform(sequence(lit(0), lit(Similarity.NumPlaneBands - 1)),
          b => xxhash64(b, call_function("shiftright", col("sig"), b * Similarity.PlaneBandBits)
            .bitwiseAND(lit((1L << Similarity.PlaneBandBits) - 1))))))
      .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "bucket")
    val pairs = banded.alias("l").join(banded.alias("r"),
        col("l.band_id") === col("r.band_id") &&
        col("l.bucket") === col("r.bucket") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        Similarity.dot(col("l.v"), col("r.v")).as("cos"))
      .distinct()
      .filter(col("cos") >= threshold)
      .select(col("doc_a"), col("doc_b"))
    neighborSummary(vecs, pairs)
  }

  val ops: Seq[Op] = Seq(
    Op("q_dedup_exact", exact,
      Some("""
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY text ORDER BY doc_id""")),
    // LSH internals are not ANSI-SQL-expressible → rows-only + ScalaTest
    Op("q_dedup_minhash", minHashLsh, None),
    Op("q_dedup_simhash", simHash, None),
    Op("q_dedup_jaccard", (s, d) => ngramJaccard(s, d), None),
    Op("q_dedup_embed", (s, d) => embeddingCosine(s, d), None)
  )
}
