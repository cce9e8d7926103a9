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

  /** Distinct word-3-gram shingles as STRINGS (first-occurrence order);
    * docs shorter than 3 tokens fall back to one whole-trimmed-text
    * shingle, mirroring [[shingleHashes]]. The string form exists for the
    * exact-verification paths: Jaccard over strings is collision-free, so
    * the values are reproducible by an independent engine (the DuckDB
    * oracle builds the identical sets with `string_split_regex` +
    * `list_transform`), where the 32-bit hashed form could perturb a
    * count once per ~2³² distinct-shingle pairs.
    */
  private[graft] def stringShingles(text: Column): Column = {
    val ng = graft.functions.GraftFunctions.wordNgrams(text, 3)
    array_distinct(when(size(ng) > 0, ng).otherwise(array(trim(text))))
  }

  private def explodedStringShingles(docs: DataFrame): DataFrame =
    Tables.spread(docs)
      .select(col("doc_id"), explode(stringShingles(col("text"))).as("s"))

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
    * identical output for any threshold > 0 (enforced).
    *
    * Verification runs over the STRING shingles ([[stringShingles]]), not
    * the 32-bit hashes the candidate stage banded on: the hashes buy
    * nothing here (the intersection count shuffles (long, string) rows
    * either way), and string sets make the emitted `jaccard` values
    * hash-collision-free — reproducible by an independent engine, which
    * is what lets `q_near_dup_sql` carry an exact DuckDB oracle.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0,
      s"ngramJaccardPairs: threshold must be > 0 (got $threshold) — " +
        "empty-intersection pairs drop out of the inner join by design")
    verifyCandidates(docs, candidatePairs(docs), threshold)
  }

  /** Exact-Jaccard verification of an arbitrary `(doc_a, doc_b)`
    * candidate set — the shared tail of [[ngramJaccardPairs]] and the
    * streaming LSH route. Set sizes: size() collapses the shingle array
    * before any shuffle, so only (doc_id, int) rows move.
    */
  private[graft] def verifyCandidates(docs: DataFrame, candidates: DataFrame,
      threshold: Double): DataFrame = {
    val sizes = docs.select(col("doc_id"), size(stringShingles(col("text"))).as("sz"))
    val e = explodedStringShingles(docs)
    candidates
      .join(e.select(col("doc_id").as("doc_a"), col("s")), "doc_a")
      .join(e.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
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

  /** The per-row banded-signature column ([[graft.functions.MinHashBands]])
    * over THIS pipeline's permutation tables — what a streaming stateless
    * projection uses in place of the [[signatures]] aggregate.
    */
  private[graft] def minHashBandsCol(text: Column): Column =
    org.apache.spark.sql.GraftShim.column(graft.functions.MinHashBands(
      org.apache.spark.sql.GraftShim.expression(text),
      permA, permB, Prime, NumBands))

  /** EXACT all-pairs n-gram Jaccard at a threshold — the audit anchor of
    * the near-dup family. Same explode-and-count shape as
    * [[ngramJaccardPairs]] but candidates come from the inverted index
    * itself (docs sharing ≥1 shingle), not from LSH banding, so the
    * result is the ground truth the probabilistic paths are measured
    * against (the spec pins LSH recall to it; the driver's DuckDB oracle
    * recomputes it independently).
    *
    * Scale: cost is Σ_shingle df² — linear while shingles are rare
    * (near-dup corpora: almost all df ≤ dup-group size), quadratic on a
    * shingle every doc shares. This is the EXACT computation's inherent
    * price; run it on audit samples at 100 TB and use the LSH path
    * ([[ngramJaccardPairs]]) as the full-corpus plan.
    */
  def exactJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0,
      s"exactJaccardPairs: threshold must be > 0 (got $threshold) — " +
        "zero-overlap pairs drop out of the inverted-index join by design")
    val sizes = docs.select(col("doc_id"), size(stringShingles(col("text"))).as("sz"))
    val e = explodedStringShingles(docs)
    e.select(col("doc_id").as("doc_a"), col("s"))
      .join(e.select(col("doc_id").as("doc_b"), col("s")), Seq("s"))
      .filter(col("doc_a") < col("doc_b"))
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
  private def jaccardRollup(docs: DataFrame, pairs: DataFrame): DataFrame = {
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

  /** LSH-candidate + exact-verify rollup (the two-stage scale path). */
  def ngramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    jaccardRollup(docs, ngramJaccardPairs(docs, threshold))
  }

  /** Ground-truth rollup over [[exactJaccardPairs]] — the driver-facing
    * `q_dedup_jaccard`, fully recomputable by the DuckDB oracle.
    */
  def exactJaccard(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    jaccardRollup(docs, exactJaccardPairs(docs, threshold))
  }

  // ---- signature-estimator audits (anchored: exact columns are
  //      engine-recomputable, the accuracy contract is an in-plan
  //      boolean the driver's hash gate enforces) ----

  /** Per-pair estimator-accuracy bounds. MinHash with 64 permutations:
    * Hoeffding gives P(|Ĵ−J| > 0.3) ≤ 2e^(−2·64·0.09) ≈ 2·10⁻⁵ per
    * pair, and the signature is deterministic (fixed perms, fixed
    * data), so the boolean is a constant of the dataset. SimHash with
    * 64 bits estimates the token-set ANGLE: p̂ = hamming/64 ≈ θ/π
    * (Charikar 2002), so cos(π·p̂) estimates the exact token cosine
    * with slope ≤ π·sin(θ) — ~3σ ≈ 0.3 at the near-dup angles the
    * audit pairs live at. Both bounds are loose enough to hold
    * deterministically on the fixed test data (measured max deviation
    * at sf0.1: MinHash 0.076, SimHash 0.126 — 3.5× margin under each
    * bound), tight enough that a broken signature (estimating ~0
    * similarity for a true near-dup at J ≥ 0.5 / cos ≥ 0.7) flips the
    * boolean and fails the hash gate.
    */
  private[graft] val MinhashAuditBound = 0.3
  private[graft] val SimhashAuditBound = 0.45

  /** Anchored MinHash audit: over the EXACT Jaccard pair set (the
    * engine-independent anchor `q_dedup_jaccard` already proves
    * hash-reproducible), emit each pair's exact Jaccard plus a boolean
    * pinning the 64-perm signature estimate (matching-component
    * fraction) within [[MinhashAuditBound]] of it. DuckDB rebuilds the
    * exact columns from scratch and emits the contract as literal
    * `true` — an estimator regression flips the Spark-side boolean and
    * the hash gate catches it. Audit-scale by design: the pair source
    * is the Σ df² exact path (sample-scale at 100 TB); the signature
    * join ships one 64-long row per paired doc, twice.
    */
  def minhashAudit(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // tiny by construction (the near-dup pair set); cached so the
    // paired-id semi-join below doesn't recompute the Σ df² anchor
    val pairs = exactJaccardPairs(docs, threshold).persist()
    // the 64-permutation signature pass runs over PAIRED docs only —
    // the audit joins signatures to pair rows, so signing the rest of
    // the corpus is pure waste (measured: the whole-corpus signature
    // pass was ~70% of this query's cost at sf0.1)
    val ids = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct()
    val sigs = signatures(docs.join(ids, Seq("doc_id"), "left_semi"))
    val matched = (0 until NumPerms)
      .map(i => when(col(s"sa.m$i") === col(s"sb.m$i"), 1).otherwise(0))
      .reduce(_ + _)
    pairs
      .join(sigs.alias("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sigs.alias("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        (abs(matched.cast("double") / NumPerms - col("jaccard")) <= MinhashAuditBound)
          .as("est_ok"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Anchored SimHash audit: same construction, but the exact anchor is
    * the token-set COSINE (what SimHash actually estimates — hamming/64
    * ≈ angle/π, so cos(π·hamming/64) ≈ cosine between the binary
    * token-indicator vectors). Pairs come from the exact Jaccard set;
    * their token intersections are counted relationally (explode +
    * equi-join + count, the [[ngramJaccardPairs]] shape — never an
    * array-payload join), and |A∩B|/√(|A||B|) is reproducible
    * bit-for-bit (exact int product, correctly-rounded sqrt and
    * divide). The estimate-vs-exact contract rides as the in-plan
    * boolean.
    */
  def simhashAudit(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // same paired-docs restriction as [[minhashAudit]]: the exact-cosine
    // recount and the signature pass both serve only pair rows
    val pairs0 = exactJaccardPairs(docs, threshold).persist()
    val ids = pairs0
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct()
    val paired = docs.join(ids, Seq("doc_id"), "left_semi")
    def toks = array_distinct(split(trim(lower(col("text"))), "\\s+"))
    val sizes = paired.select(col("doc_id"), size(toks).as("nt"))
    val e = Tables.spread(paired).select(col("doc_id"), explode(toks).as("t"))
    val withCos = pairs0
      .select(col("doc_a"), col("doc_b"))
      .join(e.select(col("doc_id").as("doc_a"), col("t")), "doc_a")
      .join(e.select(col("doc_id").as("doc_b"), col("t")), Seq("doc_b", "t"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("ti"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("nt").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nt").as("nb")), "doc_b")
      .withColumn("cos_exact",
        col("ti").cast("double") /
          sqrt(col("na").cast("double") * col("nb").cast("double")))
    val sh = simhashSignatures(paired)
    val est = cos(lit(math.Pi) *
      bit_count(col("sha").bitwiseXOR(col("shb"))).cast("double") / lit(64.0))
    withCos
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("cos_exact"),
        (abs(est - col("cos_exact")) <= SimhashAuditBound).as("est_ok"))
      .orderBy(col("doc_a"), col("doc_b"))
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
      converged = materialized
        .filter(col("label") =!= col("prev")).isEmpty
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
    * near-dup component, with the member count it absorbed. Components
    * are always built over a VERIFIED pair set (exact Jaccard ≥
    * threshold) — merging docs on raw LSH candidates would absorb
    * band-collision noise into the wrong components. Two candidate
    * sources feed the verification, and WHICH one you call matters at
    * scale:
    *
    *  - [[survivors]] routes through [[exactJaccardPairs]] (inverted-
    *    index all-pairs): the engine-independent audit anchor — the
    *    DuckDB oracle re-derives the same components with a recursive
    *    transitive-closure CTE — but it inherits the exact path's
    *    Σ_shingle df² cost. Run it on audit samples at 100 TB.
    *  - [[survivorsLsh]] routes through [[ngramJaccardPairs]] (LSH
    *    banding → exact verify on candidates only): O(n·bands)
    *    shuffles, bucket-capped, no all-pairs stage — THE full-corpus
    *    route at 100 TB. Both sources verify with the same exact
    *    Jaccard, so the spec pins the two outputs EQUAL on planted and
    *    sf0.01 data (recall 1 at θ=0.5 under 16×4 banding; the miss
    *    probability argument lives with [[ngramJaccardPairs]]).
    */
  def survivors(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame =
    survivorsFrom(Tables.documents(spark, dir), exactJaccardPairs(_, threshold))

  /** LSH-candidate survivors — the non-quadratic 100 TB entry point.
    * See [[survivors]] for the choice between the two.
    */
  def survivorsLsh(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame =
    survivorsFrom(Tables.documents(spark, dir), ngramJaccardPairs(_, threshold))

  private def survivorsFrom(docs: DataFrame, pairSource: DataFrame => DataFrame): DataFrame =
    components(docs, pairSource(docs).select(col("doc_a"), col("doc_b")))
      .groupBy(col("label").as("doc_id"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("doc_id"))

  /** Exact embedding nearest-neighbor audit: for every vector, its
    * nearest neighbor by cosine (ties broken by lowest id — ids are
    * unique per doc, so the `max_by` ordering struct is total and the
    * result deterministic) plus how many neighbors clear the near-dup
    * threshold. Output is ids and counts only — no float columns — so an
    * independent engine reproduces it bit-for-bit from the same ranking
    * (the same cross-engine contract the green `q_sim_topk` oracle
    * already proves for cosine ordering on this data).
    *
    * Scale: O(n²) cosines — the brute-force audit anchor, same cost
    * class as [[Similarity.bruteForceTopK]] with the corpus as the query
    * set. At 100 TB this runs on audit samples; [[embeddingCosine]]
    * (hyperplane LSH + verify) is the full-corpus plan.
    */
  /** Hard ceiling on the audit's broadcast side: past this the
    * brute-force anchor would OOM executors silently mid-broadcast —
    * fail loudly at plan time instead and name the scale path.
    */
  private[graft] val EmbedAuditMaxRows = 200000L

  def embeddingNearest(spark: SparkSession, dir: String, threshold: Double = 0.9): DataFrame = {
    val vecs = Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id").as("doc_id"), col("embedding").as("v"))
    val others = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("nb"), col("embedding").as("w"))
    val n = others.count()
    require(n <= EmbedAuditMaxRows,
      s"embeddingNearest is the O(n²) brute-force AUDIT anchor: $n vectors exceed " +
        s"the $EmbedAuditMaxRows broadcast ceiling. Run it on an audit sample, or use " +
        "embeddingCosine (hyperplane LSH + verify) as the full-corpus plan.")
    vecs.join(broadcast(others), col("doc_id") =!= col("nb"))
      // score in the join's codegen'd projection; the agg that follows is
      // map-side partial over (long, long, double) rows — vectors never
      // reach an exchange
      .select(col("doc_id"), col("nb"),
        graft.functions.GraftFunctions.cosine(col("v"), col("w")).as("cos"))
      .groupBy(col("doc_id"))
      .agg(
        max_by(col("nb"), struct(col("cos"), (-col("nb")).as("tie"))).as("nn_id"),
        sum(when(col("cos") >= threshold, 1L).otherwise(0L)).as("n_near"))
      .orderBy(col("doc_id"))
  }

  /** SEMANTIC dedup over the embedding table — SemDeDup (Abbas et al.
    * 2023, "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication"): cluster the embedding space with a coarse
    * k-means quantizer, then find near-duplicate PAIRS only inside each
    * cluster and keep one representative per duplicate relation. The
    * cluster pass is what makes the quadratic pairwise step tractable —
    * cosine is computed over O(Σ clusterᵢ²) pairs instead of O(n²), and
    * semantically-duplicate vectors land in the same cluster because
    * they are, by definition, close in the embedding space.
    *
    * Spark shape: assignment is one codegen'd pass through the
    * [[graft.functions.CentroidKernel]] coarse quantizer (trained on a
    * BOUNDED driver-side sample, same kernel the IVF ANN path uses —
    * deterministic init + fixed iterations, so every engine run agrees);
    * the within-cluster self-join shuffles once on list_id; the keep
    * rule is the deterministic greedy "drop a vector iff some
    * smaller-id cluster-mate sits at cosine ≥ threshold". At 100 TB you
    * tune nLists so clusters stay executor-sized (the paper runs 50k
    * clusters over 8B embeddings); list_id skew is bounded by the
    * quantizer's balance, and the vectors cross the exchange once.
    */
  def semanticDedup(spark: SparkSession, dir: String, nLists: Int = 16,
      threshold: Double = 0.9, sampleSize: Int = 4096): DataFrame =
    semanticDedupFrame(Tables.embeddings(spark, dir), nLists, threshold, sampleSize)

  private[graft] def semanticDedupFrame(embRaw: DataFrame, nLists: Int,
      threshold: Double, sampleSize: Int): DataFrame = {
    val emb = Tables.spread(embRaw)
    val dim = graft.functions.VectorExpressions.Dim
    // orderBy before limit: a bare limit is partition-layout dependent,
    // and the quantizer sample must be identical on every engine run for
    // cluster assignment (hence the caught-duplicate set) to be
    // reproducible
    val sample = embRaw.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(sampleSize)
      .collect().map(_.getSeq[Float](1).toArray)
    val kernel = graft.functions.CentroidKernel.train(sample, nLists, dim)
    val assigned = emb.select(col("vec_id"), col("embedding").as("v"),
      element_at(graft.functions.GraftFunctions.nearestCentroids(col("embedding"), kernel, 1), 1)
        .as("list_id"))
    val dropped = assigned.alias("a").join(assigned.alias("b"),
        col("a.list_id") === col("b.list_id") && col("a.vec_id") < col("b.vec_id"))
      .filter(graft.functions.GraftFunctions.cosine(col("a.v"), col("b.v")) >= threshold)
      .select(col("b.vec_id").as("vec_id")).distinct()
    assigned.join(dropped.withColumn("removed", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("list_id"),
        coalesce(col("removed"), lit(false)).as("removed"))
      .orderBy(col("vec_id"))
  }

  /** Driver-checkable audit for [[semanticDedup]], anchored-audit
    * construction (same contract style as the ANN recall audits): the
    * exact anchor DuckDB recomputes from scratch is the GLOBAL
    * brute-force duplicate count — how many vectors have a smaller-id
    * partner at cosine ≥ threshold anywhere in the corpus. The Spark
    * side runs the clustered dedup AND the brute-force sweep in one
    * plan and emits two in-plan contract booleans: `sound_ok` (every
    * removed vector really has a smaller-id global partner — clustering
    * can never invent a duplicate) and `recall_ok` (the within-cluster
    * pass caught ≥ `floor` of the global duplicate set — planted
    * near-dups are close, so the quantizer co-assigns them). A
    * quantizer or threshold regression flips a boolean and fails the
    * driver's hash gate. The brute-force side rides the same
    * [[EmbedAuditMaxRows]] guard as [[embeddingNearest]]; the dedup
    * itself has no such bound.
    */
  def semanticDedupAudit(spark: SparkSession, dir: String,
      threshold: Double = 0.9, floor: Double = 0.5): DataFrame =
    semanticDedupAuditFrame(Tables.embeddings(spark, dir), threshold, floor)

  private[graft] def semanticDedupAuditFrame(embRaw: DataFrame,
      threshold: Double, floor: Double): DataFrame = {
    val sem = semanticDedupFrame(embRaw, nLists = 16, threshold = threshold,
      sampleSize = 4096)
    val others = embRaw.select(col("vec_id").as("nb"), col("embedding").as("w"))
    val n = others.count()
    require(n <= EmbedAuditMaxRows,
      s"semanticDedupAudit's brute-force anchor is O(n²): $n vectors exceed the " +
        s"$EmbedAuditMaxRows broadcast ceiling — audit a sample instead.")
    val globalDup = Tables.spread(embRaw)
      .select(col("vec_id"), col("embedding").as("v"))
      .join(broadcast(others), col("nb") < col("vec_id"))
      .filter(graft.functions.GraftFunctions.cosine(col("v"), col("w")) >= threshold)
      .select(col("vec_id")).distinct()
    sem.join(globalDup.withColumn("glob", lit(true)), Seq("vec_id"), "left")
      .agg(
        count(lit(1)).as("n_vectors"),
        sum(when(col("glob"), 1L).otherwise(0L)).as("n_dup_global"),
        (sum(when(col("removed") && !coalesce(col("glob"), lit(false)), 1L)
          .otherwise(0L)) === 0L).as("sound_ok"),
        (sum(when(col("removed"), 1L).otherwise(0L)).cast("double") >=
          lit(floor) * sum(when(col("glob"), 1L).otherwise(0L)).cast("double"))
          .as("recall_ok"))
  }

  /** Driver-graded semantic dedup over a DUPLICATE-PLANTED embedding
    * corpus: the synthetic embeddings are independent gaussians (max
    * pairwise cosine ~0.6 at every SF — no natural semantic duplicates),
    * so the registered query plants the duplication it must detect:
    * every tenth vector re-enters with a high id and a small first-
    * coordinate perturbation (cosine ≈ 0.9999 to its source). The
    * clustered dedup must then remove EXACTLY the planted copies — the
    * quantizer has to co-assign each copy with its source for recall,
    * and must not invent duplicates among the gaussian bulk for
    * soundness. The DuckDB oracle replays the same staging and
    * recomputes the global brute-force anchor from scratch.
    */
  def semanticDedupStaged(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val dim = graft.functions.VectorExpressions.Dim
    val planted = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(
          array(element_at(col("embedding"), 1) + lit(0.01f)),
          slice(col("embedding"), 2, dim - 1)).as("embedding"),
        col("label"))
    semanticDedupAuditFrame(base.unionByName(planted), threshold = 0.9, floor = 0.5)
  }

  /** Corpus-duplicated span statistics — the exact-substring dedup
    * signal (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better": verbatim spans repeated across documents
    * are the memorization fuel doc-level dedup misses, because the
    * containing documents themselves are not near-duplicates). Per doc:
    * how many of its distinct k-token spans occur in ≥ `minDocs`
    * documents, and the fraction of its span set that is such
    * boilerplate — the per-doc signal a span-removal or down-weighting
    * pass keys on.
    *
    * Scale shape: spans dedup row-locally (`array_distinct` — no
    * (doc, span) distinct shuffle), the span-frequency count is ONE
    * map-side-partial groupBy, and the "duplicated set" that comes back
    * is by construction the corpus's repeated boilerplate — a bounded
    * set that broadcasts into a semi-join, so the per-doc recount never
    * shuffles on the (skewed) span key. `broadcastDupSet = false` keeps
    * the shuffle semi-join for corpora whose duplicated set outgrows
    * executor memory (same trade as [[TextOps.unigramLogProb]]).
    * The exact-substring literature builds suffix arrays on dedicated
    * hosts; this is the relational spelling — string spans keep the
    * DuckDB oracle byte-exact (a production run at 100 TB would
    * xxhash64 the span column and shuffle 8-byte keys instead;
    * collision odds ~n²·2⁻⁶⁴ are immaterial for a filter signal).
    *
    * Docs shorter than k tokens have no spans: n_spans = 0, ratio 0.
    */
  def duplicatedSpans(spark: SparkSession, dir: String,
      k: Int = 5, minDocs: Int = 3, broadcastDupSet: Boolean = true): DataFrame = {
    require(k >= 1, s"span length must be >= 1, got $k")
    require(minDocs >= 2, s"duplication needs minDocs >= 2, got $minDocs")
    val docs = Tables.documents(spark, dir).filter(col("text").isNotNull)
    def ng = array_distinct(graft.functions.GraftFunctions.wordNgrams(col("text"), k))
    val spans = Tables.spread(docs).select(col("doc_id"), explode(ng).as("s"))
    val dupSet = spans.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs).select(col("s"))
    val dupPerDoc = spans
      .join(if (broadcastDupSet) broadcast(dupSet) else dupSet, Seq("s"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dup"))
    docs.select(col("doc_id"), size(ng).cast("long").as("n_spans"))
      .join(dupPerDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("dup"), lit(0L)).as("n_dup_spans"))
      .withColumn("dup_ratio",
        when(col("n_spans") > 0,
          col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
          .otherwise(lit(0.0)))
      .orderBy(col("doc_id"))
  }

  /** Loud ceiling for the driver-collected duplicated-span set — same
    * guard discipline as [[TextOps.MaxBoilerplateLines]]: the set is
    * bounded cross-doc boilerplate by construction, and a corpus that
    * breaks the assumption should fail loudly, not OOM the driver.
    */
  private[graft] val MaxDupSpanSet = 200000

  /** Duplicated-span REMOVAL — the rewrite [[duplicatedSpans]] only
    * measures: excise every occurrence of a corpus-duplicated k-token
    * span from every document (Lee et al. 2022's ExactSubstr
    * deduplication, which cuts the repeated substring but keeps both
    * containing documents — doc-level dedup misses these because the
    * documents themselves are not near-duplicates). A token survives iff
    * NO duplicated span covers its position; survivors rejoin in
    * original order, single-spaced (the rewrite is a token-stream
    * operation, same as the suffix-array original).
    *
    * Scale shape: the duplicated set comes from the SAME one
    * map-side-partial groupBy as [[duplicatedSpans]] (per-doc
    * distinctness is row-local), and the rewrite is a PURE PROJECTION —
    * the codegen'd [[graft.functions.RemoveSpans]] kernel probes each
    * positional k-gram against a broadcast hash set (O(tokens) hash
    * probes per doc, zero corpus shuffle; the earlier interpreted
    * `transform`/`array_contains`-over-literal spelling was
    * O(tokens × |dupSet|) string comparisons per doc and ran 182 s at
    * sf0.1). `broadcastSet = false` is the join fallback for a corpus
    * whose duplicated set outgrows executor memory: positional
    * anti-join on (doc_id, pos) + ordered re-assembly, one doc_id
    * shuffle. Spec pins both branches equal.
    */
  def removeDuplicatedSpans(spark: SparkSession, dir: String,
      k: Int = 5, minDocs: Int = 3, broadcastSet: Boolean = true): DataFrame = {
    require(k >= 1, s"span length must be >= 1, got $k")
    require(minDocs >= 2, s"duplication needs minDocs >= 2, got $minDocs")
    val docs = Tables.documents(spark, dir).filter(col("text").isNotNull)
    def ng = graft.functions.GraftFunctions.wordNgrams(col("text"), k)
    def ws = split(trim(col("text")), "\\s+")
    val dupSet = Tables.spread(docs)
      .select(explode(array_distinct(ng)).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs).select(col("s"))
    if (broadcastSet) {
      val dl = dupSet.collect().map(_.getString(0))
      require(dl.length <= MaxDupSpanSet,
        s"duplicated-span set ${dl.length} exceeds $MaxDupSpanSet — " +
          "use broadcastSet = false (anti-join path) for this corpus")
      val bc = spark.sparkContext.broadcast(dl)
      val r = org.apache.spark.sql.GraftShim.column(
        graft.functions.RemoveSpans(
          org.apache.spark.sql.GraftShim.expression(col("text")), bc, k))
      docs.select(col("doc_id"), r.as("r"))
        .select(col("doc_id"), col("r.cleaned").as("cleaned"),
          col("r.n_kept").as("n_kept"), col("r.n_removed").as("n_removed"))
        .orderBy(col("doc_id"))
    } else {
      val spread = Tables.spread(docs)
      val coveredPos = spread
        .select(col("doc_id"), posexplode(ng).as(Seq("i", "s")))
        .join(broadcast(dupSet), Seq("s"), "left_semi")
        .select(col("doc_id"), explode(sequence(col("i"), col("i") + lit(k - 1))).as("pos"))
        .distinct()
      val toks = spread.select(col("doc_id"), posexplode(ws).as(Seq("pos", "t")))
      val rebuilt = toks
        .join(coveredPos, Seq("doc_id", "pos"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("t")))),
          s => s.getField("t")).as("kt"))
        .select(col("doc_id"), concat_ws(" ", col("kt")).as("cleaned"),
          size(col("kt")).cast("long").as("n_kept"))
      // docs whose every token was covered drop out of the anti-join —
      // restore them as empty rewrites
      docs.select(col("doc_id"), size(ws).cast("long").as("n_toks"))
        .join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cleaned"), lit("")).as("cleaned"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_toks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
        .orderBy(col("doc_id"))
    }
  }

  /** Shared DuckDB CTE list: the exact string-shingle pair set at θ=0.5,
    * rebuilt from scratch in SQL — distinct word 3-grams (whole-trimmed-
    * text fallback under 3 tokens, exactly [[stringShingles]]'s contract)
    * through an inverted-index join. Composes into the `q_dedup_jaccard`,
    * `q_dedup_survivors`, and `q_near_dup_sql` oracles.
    */
  private[graft] val ExactPairsCtes = """
    w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws, trim(text) AS tt
      FROM documents WHERE text IS NOT NULL),
    shg AS (
      SELECT doc_id, unnest(list_distinct(CASE WHEN len(ws) >= 3
        THEN list_transform(range(0, len(ws) - 2),
               i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
        ELSE [tt] END)) AS s
      FROM w),
    sz AS (SELECT doc_id, count(*) AS sz FROM shg GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM shg a JOIN shg b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
      FROM inter
      JOIN sz sa ON sa.doc_id = doc_a
      JOIN sz sb ON sb.doc_id = doc_b
      WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5)"""

  /** Recursive transitive-closure oracle shared by both survivor
    * entries: on the test data the LSH path's verified pair set equals
    * the exact all-pairs set (DedupSpec pins it), so one closure over
    * [[ExactPairsCtes]] checks both.
    */
  private val SurvivorsOracle = s"""
    WITH RECURSIVE $ExactPairsCtes,
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    labels AS (SELECT a AS doc_id, min(b) AS label FROM reach GROUP BY a)
    SELECT label AS doc_id, count(*) AS n_members
    FROM labels GROUP BY label ORDER BY doc_id"""

  /** INCREMENTAL dedup: a new batch deduped AGAINST a historical
    * corpus — the continuous-corpus-building production shape, where
    * yesterday's corpus is fixed and only today's landing must be
    * checked. Every new doc gets a status: `exact` (verbatim copy of a
    * corpus doc, 128-bit digest semi-join — 32-byte shuffle rows),
    * `near` (verified string-shingle Jaccard >= threshold against some
    * corpus doc), else `kept`; exact wins precedence.
    *
    * Scale shape — the asymmetry IS the point: new-batch LSH bands
    * PROBE the corpus bands, so the corpus×corpus and batch×batch
    * quadratic spaces never exist; cost is O(batch bands) joined
    * against a bucketed index the corpus side computes once (at 100 TB
    * the corpus bands are a precomputed table, re-derived here because
    * the driver query owns no state between runs). Candidates verify
    * with EXACT Jaccard over only their shingles, same recall argument
    * as [[ngramJaccardPairs]] (the spec pins LSH+verify == exact
    * all-pairs on this data).
    */
  private[graft] def dedupAgainstFrame(newDocs: DataFrame, corpus: DataFrame,
      threshold: Double): DataFrame = {
    require(threshold > 0,
      s"dedupAgainstFrame: threshold must be > 0 (got $threshold)")
    val exactIds = newDocs.select(col("doc_id"), md5(col("text")).as("h"))
      .join(corpus.select(md5(col("text")).as("h")).distinct(),
        Seq("h"), "left_semi")
      .select(col("doc_id"))
    val nb = capBuckets(bandedSignature(newDocs), Seq("band_id", "band_hash"))
    val ob = capBuckets(bandedSignature(corpus), Seq("band_id", "band_hash"))
    val cands = nb.alias("n").join(ob.alias("o"),
        col("n.band_id") === col("o.band_id") &&
        col("n.band_hash") === col("o.band_hash"))
      .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("old_id"))
      .distinct()
    val sizesN = newDocs.select(col("doc_id").as("new_id"),
      size(stringShingles(col("text"))).as("sz_n"))
    val sizesO = corpus.select(col("doc_id").as("old_id"),
      size(stringShingles(col("text"))).as("sz_o"))
    val eN = explodedStringShingles(newDocs)
      .select(col("doc_id").as("new_id"), col("s"))
    val eO = explodedStringShingles(corpus)
      .select(col("doc_id").as("old_id"), col("s"))
    val nearIds = cands
      .join(eN, "new_id").join(eO, Seq("old_id", "s"))
      .groupBy(col("new_id"), col("old_id")).agg(count(lit(1)).as("inter"))
      .join(sizesN, "new_id").join(sizesO, "old_id")
      .filter(col("inter").cast("double") /
        (col("sz_n") + col("sz_o") - col("inter")).cast("double") >= threshold)
      .select(col("new_id").as("doc_id")).distinct()
    newDocs.select(col("doc_id"))
      .join(exactIds.withColumn("is_exact", lit(true)), Seq("doc_id"), "left")
      .join(nearIds.withColumn("is_near", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact"), lit("exact"))
          .when(col("is_near"), lit("near"))
          .otherwise(lit("kept")).as("status"))
      .orderBy(col("doc_id"))
  }

  /** Driver-graded incremental dedup: corpus = docs with id % 7 != 0,
    * new batch = the id % 7 == 0 docs PLUS planted verbatim copies of
    * a deterministic corpus slice (id % 50 == 1, re-keyed +1,000,000 —
    * the synthetic corpus has no natural exact cross-dups, so the
    * exact branch needs planting; the near branch fires naturally on
    * the corpus's near-dup groups that straddle the split).
    */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val corpus = all.filter(col("doc_id") % 7 =!= 0)
    val newDocs = all.filter(col("doc_id") % 7 === 0)
      .unionByName(corpus.filter(col("doc_id") % 50 === 1)
        .withColumn("doc_id", col("doc_id") + 1000000L))
    dedupAgainstFrame(newDocs, corpus, threshold = 0.5)
  }

  val ops: Seq[Op] = Seq(
    Op("q_dedup_semantic", semanticDedupStaged,
      Some("""
        WITH staged AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000,
                 list_prepend(embedding[1] + CAST(0.01 AS FLOAT), embedding[2:])
          FROM embeddings WHERE vec_id % 10 = 0),
        dup AS (
          SELECT b.vec_id AS v
          FROM staged a JOIN staged b ON a.vec_id < b.vec_id
            AND list_cosine_similarity(a.embedding, b.embedding) >= 0.9
          GROUP BY 1)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM staged) AS n_vectors,
               (SELECT CAST(count(*) AS BIGINT) FROM dup) AS n_dup_global,
               true AS sound_ok, true AS recall_ok""")),
    Op("q_dedup_span_rewrite", (s, d) => removeDuplicatedSpans(s, d),
      Some("""
        WITH w AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
          FROM documents WHERE text IS NOT NULL),
        ng AS (
          SELECT doc_id, ws, CASE WHEN len(ws) >= 5
            THEN list_transform(range(0, len(ws) - 4),
                   i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
                        ws[i+4] || ' ' || ws[i+5])
            ELSE CAST([] AS VARCHAR[]) END AS ngs
          FROM w),
        dup AS (
          SELECT s FROM (SELECT doc_id, unnest(list_distinct(ngs)) AS s FROM ng)
          GROUP BY s HAVING count(*) >= 3),
        dl AS (SELECT coalesce(list(s), CAST([] AS VARCHAR[])) AS ds FROM dup),
        cov AS (
          SELECT doc_id, ws, list_distinct(flatten(list_transform(
            list_filter(range(0, len(ngs)), i -> list_contains(d.ds, ngs[i+1])),
            i -> range(i, i + 5)))) AS covered
          FROM ng, dl d),
        kept AS (
          SELECT doc_id, len(ws) AS nw, list_transform(
            list_filter(range(0, len(ws)), j -> NOT list_contains(covered, j)),
            j -> ws[j+1]) AS kt
          FROM cov)
        SELECT doc_id, coalesce(array_to_string(kt, ' '), '') AS cleaned,
               CAST(len(kt) AS BIGINT) AS n_kept,
               CAST(nw - len(kt) AS BIGINT) AS n_removed
        FROM kept ORDER BY doc_id""")),
    Op("q_dedup_incremental", dedupIncremental,
      Some("""
        WITH nd AS (
          SELECT doc_id, text FROM documents
          WHERE text IS NOT NULL AND doc_id % 7 = 0
          UNION ALL
          SELECT doc_id + 1000000, text FROM documents
          WHERE text IS NOT NULL AND doc_id % 7 <> 0 AND doc_id % 50 = 1),
        cp AS (
          SELECT doc_id, text FROM documents
          WHERE text IS NOT NULL AND doc_id % 7 <> 0),
        ex AS (SELECT DISTINCT n.doc_id FROM nd n JOIN cp c ON n.text = c.text),
        wn AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws,
                      trim(text) AS tt FROM nd),
        wc AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws,
                      trim(text) AS tt FROM cp),
        sn AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(ws) >= 3
          THEN list_transform(range(0, len(ws)-2),
                 i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
          ELSE [tt] END)) AS s FROM wn),
        sc AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(ws) >= 3
          THEN list_transform(range(0, len(ws)-2),
                 i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
          ELSE [tt] END)) AS s FROM wc),
        szn AS (SELECT doc_id, count(*) AS sz FROM sn GROUP BY doc_id),
        szc AS (SELECT doc_id, count(*) AS sz FROM sc GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS nid, b.doc_id AS cid, count(*) AS i
          FROM sn a JOIN sc b ON a.s = b.s GROUP BY 1, 2),
        near AS (SELECT DISTINCT nid AS doc_id FROM inter
          JOIN szn ON szn.doc_id = nid JOIN szc ON szc.doc_id = cid
          WHERE CAST(i AS DOUBLE) / (szn.sz + szc.sz - i) >= 0.5)
        SELECT nd.doc_id,
          CASE WHEN ex.doc_id IS NOT NULL THEN 'exact'
               WHEN near.doc_id IS NOT NULL THEN 'near' ELSE 'kept' END AS status
        FROM nd LEFT JOIN ex ON ex.doc_id = nd.doc_id
                LEFT JOIN near ON near.doc_id = nd.doc_id
        ORDER BY nd.doc_id""")),
    Op("q_dedup_survivors", (s, d) => survivors(s, d), Some(SurvivorsOracle)),
    Op("q_dedup_survivors_lsh", (s, d) => survivorsLsh(s, d), Some(SurvivorsOracle)),
    Op("q_dedup_exact", exact,
      Some("""
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY text ORDER BY doc_id""")),
    // Anchored audits: exact anchor columns rebuilt from scratch by
    // DuckDB; the estimator-accuracy contract is an in-plan boolean the
    // oracle emits as literal true (a signature regression flips it →
    // hash mismatch). The raw neighborhood operators (minHashLsh,
    // simHash) stay spec-covered — their bucket internals are
    // seed-dependent and not SQL-expressible.
    Op("q_dedup_minhash", (s, d) => minhashAudit(s, d),
      Some(s"""
        WITH $ExactPairsCtes
        SELECT doc_a, doc_b, jaccard, true AS est_ok
        FROM pairs ORDER BY doc_a, doc_b""")),
    Op("q_dedup_simhash", (s, d) => simhashAudit(s, d),
      Some(s"""
        WITH $ExactPairsCtes,
        tw AS (
          SELECT doc_id,
                 list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS ts
          FROM documents WHERE text IS NOT NULL),
        tk AS (SELECT doc_id, unnest(ts) AS t FROM tw),
        tn AS (SELECT doc_id, len(ts) AS nt FROM tw),
        ti AS (
          SELECT p.doc_a, p.doc_b, count(*) AS i
          FROM pairs p
          JOIN tk a ON a.doc_id = p.doc_a
          JOIN tk b ON b.doc_id = p.doc_b AND b.t = a.t
          GROUP BY 1, 2)
        SELECT ti.doc_a, ti.doc_b,
               CAST(i AS DOUBLE) /
                 sqrt(CAST(na.nt AS DOUBLE) * CAST(nb.nt AS DOUBLE)) AS cos_exact,
               true AS est_ok
        FROM ti
        JOIN tn na ON na.doc_id = ti.doc_a
        JOIN tn nb ON nb.doc_id = ti.doc_b
        ORDER BY doc_a, doc_b""")),
    Op("q_dedup_spans", (s, d) => duplicatedSpans(s, d),
      Some("""
        WITH w AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
          FROM documents WHERE text IS NOT NULL),
        sp AS (
          SELECT doc_id, unnest(list_distinct(CASE WHEN len(ws) >= 5
            THEN list_transform(range(0, len(ws) - 4),
                   i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
                        ws[i+4] || ' ' || ws[i+5])
            ELSE [] END)) AS s
          FROM w),
        sz AS (SELECT doc_id, count(*) AS n FROM sp GROUP BY doc_id),
        dup AS (SELECT s FROM sp GROUP BY s HAVING count(*) >= 3),
        dc AS (SELECT doc_id, count(*) AS nd FROM sp JOIN dup USING (s) GROUP BY doc_id)
        SELECT w.doc_id,
               coalesce(sz.n, 0) AS n_spans,
               coalesce(dc.nd, 0) AS n_dup_spans,
               CASE WHEN coalesce(sz.n, 0) > 0
                    THEN CAST(coalesce(dc.nd, 0) AS DOUBLE) / sz.n
                    ELSE 0.0 END AS dup_ratio
        FROM w LEFT JOIN sz USING (doc_id) LEFT JOIN dc USING (doc_id)
        ORDER BY w.doc_id""")),
    Op("q_dedup_jaccard", (s, d) => exactJaccard(s, d),
      Some(s"""
        WITH $ExactPairsCtes,
        sym AS (
          SELECT doc_a AS doc_id, jaccard FROM pairs
          UNION ALL SELECT doc_b, jaccard FROM pairs)
        SELECT d.doc_id, count(p.jaccard) AS n_verified,
               coalesce(max(p.jaccard), 0.0) AS best_jaccard
        FROM documents d LEFT JOIN sym p USING (doc_id)
        GROUP BY d.doc_id ORDER BY d.doc_id""")),
    Op("q_dedup_embed", (s, d) => embeddingNearest(s, d),
      Some("""
        WITH p AS (
          SELECT a.vec_id AS doc_id, b.vec_id AS nb,
                 list_cosine_similarity(a.embedding, b.embedding) AS c
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
        nn AS (
          SELECT doc_id, nb AS nn_id FROM (
            SELECT doc_id, nb,
                   row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, nb) AS rn
            FROM p)
          WHERE rn = 1),
        near AS (
          SELECT doc_id, CAST(count(*) FILTER (WHERE c >= 0.9) AS BIGINT) AS n_near
          FROM p GROUP BY doc_id)
        SELECT doc_id, nn_id, n_near
        FROM nn JOIN near USING (doc_id) ORDER BY doc_id"""))
  )
}
