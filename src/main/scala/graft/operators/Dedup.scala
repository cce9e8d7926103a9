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
  *  - signatures run as explode(shingles) → codegen'd HashAggregate with
  *    one min/sum column per permutation/bit. Partial aggregation folds a
  *    doc's shingles map-side, so the shuffle carries ONE row per doc per
  *    partition — and everything stays in whole-stage codegen. (The
  *    tempting higher-order-function formulation — transform over a
  *    permutation array — is interpreted, not codegen'd, and Catalyst's
  *    CollapseProject happily inlines the shingle computation into the
  *    per-permutation lambda: measured 200×
  *    slower on the same data. Keep signatures OUT of lambdas.)
  *  - the only other shuffles key on (band_id, band_hash) / simhash
  *    blocks — uniform by construction, O(n·bands) rows, never O(n²);
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
  private[graft] def shingleHashes(text: Column): Column =
    graft.functions.GraftFunctions.shingles(text)

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

  /** Per-row MinHash signature (array column). Interpreted HOF — fine for
    * spot checks on small frames (the spec's jaccard-estimate test); the
    * operator path uses the codegen'd [[signatures]] aggregate instead.
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

  /** (doc_id, shingle_hash) rows — the map side of every signature agg.
    * One interpreted shingle pass per doc, then everything downstream is
    * codegen'd.
    */
  private def explodedShingles(docs: DataFrame): DataFrame =
    Tables.spread(docs)
      .select(col("doc_id"), explode(shingleHashes(col("text"))).as("x"))

  /** MinHash signatures as 64 columns m0..m63: min over the doc's shingles
    * of (aᵢ·x+bᵢ mod p). Codegen'd HashAggregate, map-side partial min.
    */
  private[graft] def signatures(docs: DataFrame): DataFrame = {
    val aggs = (0 until NumPerms).map { i =>
      min(pmod(lit(permA(i)) * col("x") + lit(permB(i)), lit(Prime))).as(s"m$i")
    }
    explodedShingles(docs).groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** (doc_id, band_id, band_hash) rows for LSH bucketing: band b hashes
    * its RowsPerBand signature components in one variadic xxhash64.
    */
  private[graft] def bandedSignature(docs: DataFrame): DataFrame = {
    val bandHashes = (0 until NumBands).map { b =>
      val comps = (0 until RowsPerBand).map(r => col(s"m${b * RowsPerBand + r}"))
      xxhash64(lit(b) +: comps: _*)
    }
    signatures(docs)
      .select(col("doc_id"), posexplode(array(bandHashes: _*)))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")
  }

  /** Docs kept per LSH bucket before pair generation. A bucket of b docs
    * emits O(b²) pairs, so one pathological bucket (template/boilerplate
    * text all hashing together) would turn a linear self-join quadratic.
    * Capping keeps the lowest `BucketCap` doc_ids per bucket: bounded
    * worst case, deterministic survivors, and dup groups larger than the
    * cap are the exact-dedup operator's job (compose `exact` first).
    */
  private[graft] val BucketCap = 512

  private def capBuckets(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("doc_id"))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= BucketCap).drop("rn")
  }

  /** Candidate near-dup pairs: docs sharing ≥1 LSH bucket (a<b, distinct).
    * Self-join of ONE banded frame keyed on (band_id, band_hash): uniform,
    * bounded buckets, and the two sides canonicalize to the same exchange
    * (ReusedExchange — the signature agg runs once).
    */
  private[graft] def candidatePairs(docs: DataFrame): DataFrame = {
    val bands = capBuckets(bandedSignature(docs), Seq("band_id", "band_hash"))
    bands.alias("l").join(bands.alias("r"),
        col("l.band_id") === col("r.band_id") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** Both directions of a pair set in ONE pass (explode, not union — a
    * union would re-run the whole upstream candidate pipeline twice).
    */
  private def symmetrized(pairs: DataFrame, payload: String): DataFrame =
    pairs.select(explode(array(
        struct(col("doc_a").as("doc_id"), col("doc_b").as(payload)),
        struct(col("doc_b").as("doc_id"), col("doc_a").as(payload)))).as("e"))
      .select(col("e.doc_id"), col(s"e.$payload"))

  /** Per-doc neighbor rollup of a pair set → (doc_id, n_candidates,
    * min_neighbor) for EVERY doc (docs with no candidates keep 0/null),
    * so the result is total and deterministic.
    */
  private def neighborSummary(docs: DataFrame, pairs: DataFrame): DataFrame =
    docs.select(col("doc_id"))
      .join(symmetrized(pairs, "neighbor"), Seq("doc_id"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("neighbor")).as("n_candidates"),
        min(col("neighbor")).as("min_neighbor"))
      .orderBy(col("doc_id"))

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

  /** Per-row 64-bit SimHash (Charikar): per token-hash bit i, sum ±1;
    * sign → bit. Interpreted HOF for small-frame spot checks; the
    * operator path uses the codegen'd [[simhashSignatures]].
    */
  private[graft] def simhash64(text: Column): Column = {
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

  /** (doc_id, sh) via explode(token hashes) → codegen'd sum per bit →
    * assemble the 64-bit signature. Same values as [[simhash64]].
    */
  private[graft] def simhashSignatures(docs: DataFrame): DataFrame = {
    val tokHashes = Tables.spread(docs)
      .select(col("doc_id"),
        explode(array_distinct(split(trim(lower(col("text"))), "\\s+"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitAggs = (0 until 64).map { i =>
      sum(when(call_function("shiftright", col("h"), lit(i)).bitwiseAND(lit(1L)) === 1L,
        lit(1L)).otherwise(lit(-1L))).as(s"c$i")
    }
    val sh = (0 until 64).map { i =>
      when(col(s"c$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    tokHashes.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), sh.as("sh"))
  }

  /** SimHash near-dup: candidates share one of 4 16-bit blocks (pigeonhole:
    * any pair at hamming ≤ 3 shares a block); verified bit_count(xor) ≤ 3.
    */
  def simHash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val blockCols = (0 until 4).map { b =>
      call_function("shiftright", col("sh"), lit(b * 16)).bitwiseAND(lit(0xFFFFL))
    }
    val blocks = capBuckets(
      simhashSignatures(docs)
        .select(col("doc_id"), col("sh"), posexplode(array(blockCols: _*)))
        .withColumnRenamed("pos", "block_id").withColumnRenamed("col", "block"),
      Seq("block_id", "block"))
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
    *
    * Plan shape is explode-and-count, NOT array-payload joins: joining
    * each doc's full shingle ARRAY onto the pair rows (the obvious
    * formulation) ships every candidate doc's whole shingle set through
    * two shuffles and then runs interpreted `array_intersect`/
    * `array_union` per pair — measured as the slowest query in the
    * suite. Instead the intersection is computed relationally:
    * join candidates to the exploded (doc_id, shingle) rows of each
    * side, equi-join on the shingle, and COUNT matches per pair — every
    * shuffle row is (long, long, long), the count is a codegen'd
    * HashAggregate with map-side partials, and |A∪B| follows from the
    * per-doc set sizes (|A|+|B|−|A∩B|), which travel as one int per doc.
    * Pairs with an empty intersection drop out of the inner join —
    * identical output for any threshold > 0.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    // Set sizes: size() collapses the shingle array before any shuffle,
    // so only (doc_id, int) rows move.
    val sizes = docs.select(col("doc_id"), size(shingleHashes(col("text"))).as("sz"))
    val e = explodedShingles(docs)
    candidatePairs(docs)
      .join(e.select(col("doc_id").as("doc_a"), col("x")), "doc_a")
      .join(e.select(col("doc_id").as("doc_b"), col("x")), Seq("doc_b", "x"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Per-doc rollup of verified neighbors (total over all docs so the
    * result is deterministic and never empty).
    */
  def ngramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = ngramJaccardPairs(docs, threshold)
    val sym = pairs.select(explode(array(
        struct(col("doc_a").as("doc_id"), col("jaccard")),
        struct(col("doc_b").as("doc_id"), col("jaccard")))).as("e"))
      .select(col("e.doc_id"), col("e.jaccard"))
    docs.select(col("doc_id"))
      .join(sym, Seq("doc_id"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("jaccard")).as("n_verified"),
        coalesce(max(col("jaccard")), lit(0.0)).as("best_jaccard"))
      .orderBy(col("doc_id"))
  }

  /** Embedding-cosine near-dup: 32-plane random-hyperplane signature, 4
    * bands of 8 bits (256 buckets/band — near-dup thresholds keep per-band
    * match probability high, so precision comes from longer bands, unlike
    * the ANN path's recall-oriented 4-bit bands) → exact cosine within
    * buckets ≥ threshold → per-vec neighborhood.
    * Scale: signature per row (no shuffle), bucket join keys on one byte
    * of signature × band — O(n·bands); cosine only on candidates, and the
    * threshold filter runs BEFORE the pair-dedup shuffle so only
    * near-dups ever shuffle.
    */
  private val EmbedPlanes = 32
  private val EmbedBandBits = 8
  private val EmbedBands = EmbedPlanes / EmbedBandBits

  def embeddingCosine(spark: SparkSession, dir: String, threshold: Double = 0.9): DataFrame = {
    val vecs = Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id").as("doc_id"), col("embedding").as("v"),
        graft.functions.GraftFunctions.hyperplaneSig(col("embedding"), EmbedPlanes).as("sig"))
    val bucketCols = (0 until EmbedBands).map { b =>
      xxhash64(lit(b), call_function("shiftright", col("sig"), lit(b * EmbedBandBits))
        .bitwiseAND(lit((1L << EmbedBandBits) - 1)))
    }
    // SLIM band rows (doc_id, band_id, bucket — 24B) ride the cap window
    // and the self-join; the 512B vectors attach only to the distinct
    // candidate PAIRS afterwards — same candidates-then-payload shape as
    // ngramJaccardPairs, and the band shuffles never carry vectors.
    val banded = capBuckets(
      vecs.select(col("doc_id"), posexplode(array(bucketCols: _*)))
        .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "bucket"),
      Seq("band_id", "bucket"))
    val candidates = banded.alias("l").join(banded.alias("r"),
        col("l.band_id") === col("r.band_id") &&
        col("l.bucket") === col("r.bucket") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
    // Attach payloads with ONE pass over the vector table, not two:
    // joining vecs once per side shuffles the full 512 B-vector table
    // twice. Instead explode each pair into its two members, join the
    // vector table ONCE on the member id, and fold the two rows back
    // into (va, vb) with a map-side-partial first(when(...)) aggregate —
    // the full table shuffles once, and the re-pair shuffle carries only
    // 2 rows per CANDIDATE pair (bounded ≪ corpus by the bucket cap).
    val attached = candidates
      .select(explode(array(
          struct(col("doc_a"), col("doc_b"), col("doc_a").as("member")),
          struct(col("doc_a"), col("doc_b"), col("doc_b").as("member")))).as("e"))
      .select(col("e.doc_a"), col("e.doc_b"), col("e.member"))
      .join(vecs.select(col("doc_id").as("member"), col("v")), "member")
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(
        first(when(col("member") === col("doc_a"), col("v")), ignoreNulls = true).as("va"),
        first(when(col("member") === col("doc_b"), col("v")), ignoreNulls = true).as("vb"))
    val pairs = attached
      .filter(graft.functions.GraftFunctions.cosine(col("va"), col("vb")) >= threshold)
      .select(col("doc_a"), col("doc_b"))
    neighborSummary(vecs, pairs)
  }

  /** Connected components over a pair set by min-label propagation WITH
    * pointer doubling: every doc starts labeled with itself; each round
    * takes the min over (its label, its neighbors' labels, and its
    * LABEL'S label — the shortcut). The neighbor step alone advances one
    * hop per round (O(diameter) rounds); the label(label(u)) shortcut
    * halves every pointer chain each round, so convergence is
    * O(log diameter) — the same doubling that drives large-star/
    * small-star (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014). A 1000-link chain of near-dups converges in
    * ~10 rounds instead of 1000. Labels are always existing doc_ids
    * (mins of seen labels), so the shortcut self-join is total. The
    * driver-side loop only checks a CHANGE COUNT per round (a scalar),
    * never collects data.
    */
  private[graft] def components(
      docs: DataFrame, pairs: DataFrame, maxRounds: Int = 10): DataFrame = {
    // Materialize the edge set ONCE: each round's join is a separate
    // action, and without this every round would re-execute the whole
    // upstream candidate pipeline (LSH signatures, banding, self-join)
    // just to re-derive the same edges.
    val edges = symmetrized(pairs, "neighbor").localCheckpoint()
    var labels = docs.select(col("doc_id"), col("doc_id").as("label"))
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "neighbor"), "neighbor")
        .select(col("doc_id"), col("label"), lit(Long.MaxValue).as("prev"))
      // Pointer doubling: u's label jumps straight to label(label(u)).
      val viaShortcut = labels.alias("a")
        .join(labels.alias("b"), col("a.label") === col("b.doc_id"))
        .select(col("a.doc_id"), col("b.label").as("label"), lit(Long.MaxValue).as("prev"))
      // The labels relation has exactly one row per doc (groupBy
      // invariant), so min(prev) recovers each doc's previous label and
      // the convergence check below is a scan of the materialized
      // result — no join against the old generation.
      val next = labels.withColumn("prev", col("label"))
        .unionByName(viaNeighbors).unionByName(viaShortcut)
        .groupBy(col("doc_id"))
        .agg(min(col("label")).as("label"), min(col("prev")).as("prev"))
      // localCheckpoint: cut the lineage so round N's plan doesn't
      // re-execute rounds 1..N-1 (and the convergence count reuses the
      // materialized result instead of a second full pass)
      val materialized = next.localCheckpoint()
      val changed = materialized
        .filter(col("label") =!= col("prev")).limit(1).count()
      converged = changed == 0
      // release the superseded generation's blocks — without this, up to
      // maxRounds full label sets stay pinned in the block manager
      val prevGen = labels
      labels = materialized.select(col("doc_id"), col("label"))
      prevGen.unpersist(blocking = false)
      round += 1
    }
    if (!converged) {
      // Silent truncation here would split oversized components into
      // several survivors downstream — surface it loudly instead. With
      // pointer doubling this means diameter > ~2^maxRounds.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"components: label propagation did NOT converge within $maxRounds rounds " +
          s"(covers component diameter ~2^$maxRounds via pointer doubling); " +
          "labels for larger components are split. Raise maxRounds.")
    }
    labels
  }

  /** The deduplicated corpus: one survivor (lowest doc_id) per
    * MinHash-near-dup component, with the member count it absorbed.
    * Composes the full ladder: LSH candidates → components → survivors.
    */
  def survivors(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    components(docs, candidatePairs(docs))
      .groupBy(col("label").as("doc_id"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("doc_id"))
  }

  val ops: Seq[Op] = Seq(
    Op("q_dedup_survivors", survivors, None), // iterative: spec-checked
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
