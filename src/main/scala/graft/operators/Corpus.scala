package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables

/** Corpus-preparation operators a training-data pipeline runs between
  * dedup and tokenization: PII scrubbing, deterministic stratified
  * sampling, and token-budget sequence packing.
  *
  * All three are single-pass, codegen-friendly column programs (regex and
  * window functions — no UDFs, no driver loops), so they scale with the
  * scan: at 100 TB each is one map stage (+ one bounded window shuffle for
  * packing).
  */
object Corpus {

  // Conservative patterns that parse identically under Java regex (Spark)
  // and RE2 (DuckDB): no backrefs, no lookaround.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b555-[0-9]{4}\\b"

  /** PII scrub over `documents`. The synthetic corpus carries no PII, so
    * the op first APPENDS deterministic doc_id-derived PII (an email and
    * a 555 phone number) and then must remove exactly what it added —
    * the redaction counts are exact and the oracle rebuilds the same
    * text in SQL. Redaction = regexp_replace with typed placeholders,
    * counts via regexp_extract_all, both whole-stage-codegen'd.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val withPii = docs.withColumn("text",
      concat(col("text"), lit(" Contact user"), col("doc_id"),
        lit("@mail.example.com or call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(".")))
    withPii.select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).as("n_phones"),
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>").as("scrubbed"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic hash-stratified sampling: keep a per-stratum fraction
    * decided by the first hex digit of md5(doc_id) — reproducible across
    * engines and runs (the property a training-data pipeline needs for
    * auditable corpus cuts), unlike `df.sample`'s seed-and-partition-
    * dependent Bernoulli draw. en keeps 4/16 of docs, other languages
    * 8/16. A pure filter: no shuffle, fully pushdown-friendly.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 1)
    Tables.documents(spark, dir)
      .filter(when(col("lang") === "en", bucket <= "3").otherwise(bucket <= "7"))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic train/val/test split: the assignment is a pure
    * function of doc_id (first 16 bits of md5 → percent bucket → 80/10/10),
    * so it is reproducible across engines, runs, and cluster sizes, and
    * a document NEVER migrates between splits when the corpus grows —
    * the property that keeps eval sets honest. A pure projection: no
    * shuffle, no sampling state.
    */
  def assignSplits(spark: SparkSession, dir: String): DataFrame = {
    val pct = (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("long") % 100).cast("int")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        when(pct < 80, "train").when(pct < 90, "val").otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  /** Greedy sequence packing: within each (lang, shard) stream, docs are
    * taken in doc_id order and assigned to fixed `budget`-char bins by
    * their start offset in the running concatenation — bin
    * floor(prefix_sum_before / budget). One window shuffle; the shard
    * key (doc_id % 16 here) bounds every window partition so the packing
    * parallelizes — at 100 TB you raise the shard count, never the
    * per-task state.
    */
  def packSequences(spark: SparkSession, dir: String, budget: Long = 4096L): DataFrame =
    packFrame(Tables.documents(spark, dir), budget).orderBy(col("doc_id"))

  private def packFrame(docs: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", (col("doc_id") % 16).cast("int"))
      .withColumn("start_off", sum(col("n_chars")).over(w) - col("n_chars"))
      .select(col("doc_id"), col("lang"), col("shard"),
        floor(col("start_off") / budget).as("bin"),
        (col("start_off") % budget).as("bin_off"))
  }

  /** Dataset-card rollup: per (lang, source) document counts, token and
    * character totals — the summary table every corpus release ships.
    * One partial-aggregated groupBy on a low-cardinality key: map-side
    * combine reduces 100 TB of docs to a handful of shuffle rows.
    * Exact integer sums; the only double is a final division of two
    * exact longs, bitwise identical across engines.
    */
  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("__toks", size(split(trim(col("text")), "\\s+")).cast("long"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__toks")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1)).cast("double")).as("avg_chars"))
      .orderBy(col("lang"), col("source"))

  /** Benchmark decontamination: flag every corpus document that shares at
    * least one word n-gram with a held-out benchmark set — the standard
    * guard against eval-set leakage into training data (the n-gram
    * overlap check popularized by the GPT-3/PaLM appendices).
    *
    * The benchmark split is deterministic here (docs whose
    * md5(doc_id) starts with 'f' stand in for the eval suite); in
    * production the benchmark frame is the real eval corpus. Shape:
    * explode each side into its n-grams, build the DISTINCT benchmark
    * n-gram set, and left-join corpus n-grams against it. The benchmark
    * set is an eval suite — tiny next to a 100 TB corpus by
    * construction — so the join is a broadcast: the corpus side stays
    * one narrow scan+explode with NO shuffle, and the per-doc aggregate
    * is map-side partial. Docs shorter than n words carry zero n-grams
    * and are never contaminated.
    */
  def decontaminate(spark: SparkSession, dir: String, n: Int = 8): DataFrame =
    decontaminateFrame(Tables.spread(Tables.documents(spark, dir)), n)

  /** Core kernel over any (doc_id, text) frame; `is_bench` is derived
    * from the md5 bucket (see [[decontaminate]]).
    */
  private[graft] def decontaminateFrame(docs: DataFrame, n: Int): DataFrame = {
    val bucket = substring(md5(col("doc_id").cast("string")), 1, 1)
    // n-grams from the codegen'd kernel (one JVM loop per doc) — the
    // declarative transform-over-sequence lambda is interpreted
    // per-element; semantics identical (see TextKernels.wordNgrams).
    // Per-doc distinctness is row-LOCAL (array_distinct before the
    // explode), so the per-doc rollup below is two plain map-side-
    // partial counts — the countDistinct formulation re-hashes every
    // ~50-byte 8-gram string through an Expand(×2) + distinct
    // HashAggregate, which profiling showed was the whole cost of this
    // operator (34 → ~8 task-sec at sf0.1).
    val grams = docs
      .select(col("doc_id"), (bucket === "f").as("is_bench"),
        explode(array_distinct(
          graft.functions.GraftFunctions.wordNgrams(col("text"), n))).as("ng"))
    val bench = grams.filter(col("is_bench")).select("ng").distinct()
    val perDoc = grams.filter(!col("is_bench"))
      .join(broadcast(bench.withColumn("__hit", lit(1))), Seq("ng"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ngrams"),
        count(col("__hit")).as("n_hits"))
    docs.select(col("doc_id")).filter(bucket =!= "f")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** The composed corpus pipeline, end to end in ONE declarative plan:
    * exact dedup (keep-first per text) → quality gate (token floor) →
    * deterministic 50% sample → sequence packing. Catalyst fuses the
    * stages: dedup's window and packing's window are the only shuffles,
    * the filters run map-side between them, nothing materializes. This
    * is the shape a real training-data run takes at 100 TB — and the
    * whole composition is hash-checked against one nested SQL oracle.
    */
  def pipeline(spark: SparkSession, dir: String, budget: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dedupW = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    val survivors = Tables.documents(spark, dir)
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1).drop("__rn")
    val gated = survivors
      .filter(size(split(trim(col("text")), "\\s+")) >= 20)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1) <= "7")
    packFrame(gated, budget).orderBy(col("doc_id"))
  }

  /** Token-budget chunking with overlap: split each document into
    * training-window chunks of at most `budget` tokens, consecutive
    * chunks sharing `overlap` tokens (the standard long-document →
    * context-window preprocessing step). Pure integer arithmetic on the
    * token count + one generator explode — no shuffle at all; at 100 TB
    * this is a scan-speed map stage whose output is the chunk INDEX
    * table (doc, chunk, token range), which downstream gather joins use
    * to slice the actual text.
    */
  def chunk(spark: SparkSession, dir: String,
      budget: Int = 64, overlap: Int = 16): DataFrame = {
    require(budget > overlap && overlap >= 0, "need budget > overlap >= 0")
    val stride = budget - overlap
    val docs = Tables.documents(spark, dir)
      .withColumn("n_toks", size(split(trim(col("text")), "\\s+")).cast("long"))
    // n_chunks = ceil(max(n_toks - overlap, 1) / stride), exact in
    // integer math (identical in DuckDB)
    val nChunks = floor(
      (greatest(col("n_toks") - overlap, lit(1L)) + lit(stride - 1)) / stride)
      .cast("long")
    docs
      .select(col("doc_id"), col("n_toks"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("tok_start"),
        least(col("chunk_idx") * stride + budget, col("n_toks")).as("tok_end"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Deterministic per-stratum top-N sample: the N docs with the lowest
    * md5(doc_id) per language — an auditable, engine-reproducible "exactly
    * N per stratum" corpus cut (the count-targeted sibling of
    * [[stratifiedSample]]'s fraction cut). The rank<=N window compiles to
    * WindowGroupLimit, so each map task keeps only its local top-N before
    * the per-stratum shuffle — at 100 TB the shuffle carries
    * O(strata × N) rows, not the corpus.
    */
  def sampleTopN(spark: SparkSession, dir: String, n: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
      .select(col("doc_id"), col("lang"), col("rank"))
      .orderBy(col("doc_id"))
  }

  /** Quality-weighted deterministic resampling — the "keep better docs
    * with higher probability" corpus cut (the reweighting step of the
    * DCLM/FineWeb-style quality pipelines), made auditable: the keep
    * probability derives from the doc's stopword ratio (the cheapest
    * prose-likeness signal, same case-sensitive contract as
    * [[TextOps.qualityScore]]) clamped to [0.1, 1], and the Bernoulli
    * draw is the first 16 md5 bits of doc_id (the [[assignSplits]]
    * construction) — so the sample is a PURE FILTER, reproducible
    * across engines, runs, and cluster sizes, and monotone under corpus
    * growth: re-running never flips an existing doc's fate. Zero
    * shuffle; at 100 TB this is a scan-speed pass that pushes into the
    * parquet read.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.wsTokens(col("text"))
    val sr = TextOps.stopHits(toks, TextOps.Stopwords("en")).cast("double") /
      size(toks).cast("double")
    val keepProb = least(lit(1.0), greatest(lit(0.1), lit(4.0) * sr))
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("long").cast("double") / 65536.0
    Tables.documents(spark, dir)
      .withColumn("keep_prob", keepProb)
      .filter(u < col("keep_prob"))
      .select(col("doc_id"), col("lang"), col("keep_prob"))
      .orderBy(col("doc_id"))
  }

  /** Token-length histogram: per (lang, ⌊log2(tokens)⌋ bucket) doc and
    * token totals — the sequence-length distribution every tokenization
    * / packing decision reads first. The log2 bucket is EXACT integer
    * arithmetic (digit count of the base-2 rendering, never
    * floor(ln/ln2)'s float edge at exact powers of two), and the
    * groupBy key is tiny and uniform: one map-side-partial aggregate
    * whose shuffle carries O(langs × 64) rows at any corpus size.
    */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_toks", size(TextOps.wsTokens(col("text"))).cast("long"))
      .withColumn("bucket", (length(conv(col("n_toks"), 10, 2)) - 1).cast("int"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        min(col("n_toks")).as("min_tokens"),
        max(col("n_toks")).as("max_tokens"))
      .orderBy(col("lang"), col("bucket"))

  /** Deterministic global training-order shuffle: every doc gets a
    * reproducible pseudo-random position (what a training run consumes
    * as its data order). The rank is computed in TWO levels so no
    * single-partition window ever sees the corpus: the md5 key's first
    * byte buckets docs into 256 shards, a per-shard window ranks within
    * the shard (256-way parallel), and the global position adds the
    * shard's offset — a 256-row prefix-sum broadcast back. At 100 TB:
    * one uniform shuffle on the hash key + an O(shards) side table;
    * raise the shard width for more parallelism, never the per-task
    * state. Reproducible across engines, runs, and cluster sizes —
    * the data order of a training run is an auditable artifact, not a
    * `rand()` that changes under retry.
    */
  def shuffleOrder(spark: SparkSession, dir: String): DataFrame = {
    val key = md5(concat(lit("graft-shuffle-1:"), col("doc_id").cast("string")))
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"), key.as("skey"),
        conv(substring(key, 1, 2), 16, 10).cast("int").as("shard"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))
    val ranked = keyed.withColumn("pos_in_shard", row_number().over(w).cast("long"))
    val offsetW = org.apache.spark.sql.expressions.Window
      .orderBy(col("shard"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"))
      .withColumn("offset", coalesce(sum(col("n")).over(offsetW), lit(0L)))
      .select(col("shard"), col("offset"))
    ranked.join(broadcast(offsets), "shard")
      .select(col("doc_id"), col("shard"),
        (col("offset") + col("pos_in_shard")).as("pos"))
      .orderBy(col("pos"))
  }

  /** Source mixing with oversampling — the corpus-mixture step of
    * training-set construction (curated sources repeated above 1 epoch,
    * bulk sources downsampled; the LLaMA/Pile mixture-weights shape).
    * Weights are exact BASIS POINTS per source class (25000 = 2.5
    * epochs, 2500 = 0.25), full epochs keep every doc, and the single
    * partial epoch keeps docs whose (doc, epoch)-keyed md5 bucket
    * clears the fractional threshold — deterministic, monotone, and
    * engine-reproducible like every sampling op here. A generator
    * explode + filter: zero shuffle, output size = Σ weights × docs by
    * construction.
    */
  def sourceMix(spark: SparkSession, dir: String): DataFrame = {
    val srcNum = substring(col("source"), 4, 10).cast("int")
    val bp = when(srcNum % 5 === 0, 25000)
      .when(srcNum % 5 === 1, 10000)
      .otherwise(2500)
    val fullEpochs = (col("bp") / 10000).cast("int")
    val bucket = conv(substring(md5(concat_ws(":",
      col("doc_id").cast("string"), col("epoch").cast("string"))), 1, 4), 16, 10)
      .cast("long") % 10000L
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), bp.as("bp"))
      .withColumn("epoch", explode(sequence(lit(0),
        ceil(col("bp").cast("double") / 10000.0).cast("int") - 1)))
      .filter(col("epoch") < fullEpochs ||
        (col("epoch") === fullEpochs && bucket < col("bp") % 10000L))
      .select(col("doc_id"), col("source"), col("epoch").cast("int").as("epoch"))
      .orderBy(col("doc_id"), col("epoch"))
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * public): weight every raw document by how target-domain-like its
    * HASHED N-GRAM features are, w(doc) = Σ_features ln p̂_target(b) −
    * ln p̂_raw(b) over the doc's hashed-bigram buckets, with add-one
    * smoothing on both bucket tables. Selecting the top-weighted (or
    * sampling ∝ exp w) docs is the paper's recipe for matching a
    * pretraining mix to a target domain; here the target is the
    * corpus's own `source = targetSource` slice so the op is
    * self-contained and oracle-exact.
    *
    * Scale shape — the reason DSIR beats classifier-based selection at
    * 100 TB: the "model" is two B-entry count tables (B = `buckets`,
    * fixed), built by ONE map-side-partial groupBy each over hashed
    * bigrams (md5-derived, engine-reproducible like [[assignSplits]]),
    * then broadcast; scoring is a broadcast join + per-doc sum — the
    * corpus never shuffles on a text key and nothing grows with corpus
    * size except the one (doc_id, bucket) aggregation. Zero-feature
    * docs (< 2 tokens) keep weight 0.
    */
  def dsirWeights(spark: SparkSession, dir: String,
      targetSource: String = "src1", buckets: Int = 1024,
      smoothing: Double = 1.0): DataFrame = {
    require(buckets > 0 && smoothing > 0,
      s"dsirWeights: need buckets > 0 and smoothing > 0, got ($buckets, $smoothing)")
    val docs = Tables.spread(Tables.documents(spark, dir))
      .filter(col("text").isNotNull)
    val feats = docs.select(col("doc_id"), col("source"),
        explode(graft.functions.GraftFunctions.wordNgrams(col("text"), 2)).as("bg"))
      .withColumn("b",
        conv(substring(md5(col("bg")), 1, 4), 16, 10).cast("long") % buckets)
    val raw = feats.groupBy(col("b")).agg(count(lit(1)).as("c_raw"))
    val tgt = feats.filter(col("source") === targetSource)
      .groupBy(col("b")).agg(count(lit(1)).as("c_tgt"))
    val tbl = raw.join(tgt, Seq("b"), "left")
      .select(col("b"), col("c_raw"), coalesce(col("c_tgt"), lit(0L)).as("c_tgt"))
    val tot = tbl.agg(sum(col("c_raw")).as("n_raw"), sum(col("c_tgt")).as("n_tgt"))
    val lr = tbl.crossJoin(broadcast(tot)).select(col("b"),
      (log((col("c_tgt") + lit(smoothing)) /
          (col("n_tgt") + lit(smoothing * buckets))) -
        log((col("c_raw") + lit(smoothing)) /
          (col("n_raw") + lit(smoothing * buckets)))).as("lr"))
    val scored = feats.join(broadcast(lr), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lr")).as("w"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        // rounded for cross-engine float equality, same as avg_logprob
        round(coalesce(col("w"), lit(0.0)), 9).as("dsir_weight"))
      .orderBy(col("doc_id"))
  }

  val ops: Seq[Op] = Seq(
    Op("q_dsir", (s, d) => dsirWeights(s, d),
      Some("""
        WITH docs AS (
          SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS ts
          FROM documents WHERE text IS NOT NULL),
        feats AS (
          SELECT doc_id, source,
                 CAST(concat('0x', substr(md5(bg), 1, 4)) AS INTEGER) % 1024 AS b
          FROM (SELECT doc_id, source, unnest(list_transform(
                  generate_series(1, len(ts) - 1),
                  i -> ts[i] || ' ' || ts[i + 1])) AS bg
                FROM docs)),
        raw AS (SELECT b, count(*) AS c_raw FROM feats GROUP BY b),
        tgt AS (SELECT b, count(*) AS c_tgt FROM feats
                WHERE source = 'src1' GROUP BY b),
        tbl AS (SELECT b, c_raw, coalesce(c_tgt, 0) AS c_tgt
                FROM raw LEFT JOIN tgt USING (b)),
        tot AS (SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt FROM tbl),
        w AS (
          SELECT doc_id, count(*) AS n_feats,
                 sum(ln((c_tgt + 1.0) / (n_tgt + 1024.0)) -
                     ln((c_raw + 1.0) / (n_raw + 1024.0))) AS w
          FROM feats JOIN tbl USING (b), tot
          GROUP BY doc_id)
        SELECT d.doc_id, coalesce(n_feats, 0) AS n_feats,
               round(coalesce(w, 0.0), 9) AS dsir_weight
        FROM (SELECT doc_id FROM docs) d LEFT JOIN w USING (doc_id)
        ORDER BY doc_id""")),
    Op("q_shuffle", shuffleOrder,
      Some("""
        WITH k AS (
          SELECT doc_id,
            md5(concat('graft-shuffle-1:', CAST(doc_id AS VARCHAR))) AS skey
          FROM documents),
        s AS (
          SELECT doc_id, skey,
            CAST(concat('0x', substr(skey, 1, 2)) AS INTEGER) AS shard
          FROM k),
        r AS (
          SELECT doc_id, shard,
            CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id)
              AS BIGINT) AS pos_in_shard
          FROM s),
        o AS (
          SELECT shard,
            CAST(coalesce(sum(n) OVER (ORDER BY shard
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              AS shard_offset
          FROM (SELECT shard, count(*) AS n FROM s GROUP BY shard))
        SELECT doc_id, shard, shard_offset + pos_in_shard AS pos
        FROM r JOIN o USING (shard)
        ORDER BY pos""")),
    Op("q_mix_sources", sourceMix,
      Some("""
        WITH w AS (
          SELECT doc_id, source,
            CASE WHEN CAST(substr(source, 4) AS INT) % 5 = 0 THEN 25000
                 WHEN CAST(substr(source, 4) AS INT) % 5 = 1 THEN 10000
                 ELSE 2500 END AS bp
          FROM documents),
        e AS (
          SELECT doc_id, source, bp,
            unnest(range(0, CAST(ceil(bp / 10000.0) AS BIGINT))) AS epoch
          FROM w)
        SELECT doc_id, source, CAST(epoch AS INT) AS epoch
        FROM e
        WHERE epoch < bp // 10000
           OR (epoch = bp // 10000 AND
               CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':',
                 CAST(epoch AS VARCHAR))), 1, 4)) AS INTEGER) % 10000 < bp % 10000)
        ORDER BY doc_id, epoch""")),
    Op("q_sample_weighted", weightedSample,
      Some("""
        WITH q AS (
          SELECT doc_id, lang,
            LEAST(1.0, GREATEST(0.1, 4.0 *
              (CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                 t -> t IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
               / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)))) AS keep_prob,
            CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
              / 65536.0 AS u
          FROM documents)
        SELECT doc_id, lang, keep_prob FROM q
        WHERE u < keep_prob ORDER BY doc_id""")),
    Op("q_len_hist", lengthHistogram,
      Some("""
        WITH d AS (
          SELECT lang,
            CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_toks
          FROM documents)
        SELECT lang, CAST(length(to_base(n_toks, 2)) - 1 AS INT) AS bucket,
               count(*) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS total_tokens,
               min(n_toks) AS min_tokens, max(n_toks) AS max_tokens
        FROM d GROUP BY lang, bucket ORDER BY lang, bucket""")),
    Op("q_split", assignSplits,
      Some("""
        SELECT doc_id, lang,
          CASE
            WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 < 80 THEN 'train'
            WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 < 90 THEN 'val'
            ELSE 'test'
          END AS split
        FROM documents
        ORDER BY doc_id""")),
    Op("q_chunk", (s, d) => chunk(s, d),
      Some("""
        WITH d AS (
          SELECT doc_id,
            CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_toks
          FROM documents),
        n AS (
          SELECT doc_id, n_toks,
            CAST(FLOOR((GREATEST(n_toks - 16, 1) + 47) / 48.0) AS BIGINT) AS n_chunks
          FROM d),
        e AS (
          SELECT doc_id, n_toks, unnest(range(0, n_chunks)) AS i FROM n)
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
          CAST(i * 48 AS BIGINT) AS tok_start,
          CAST(LEAST(i * 48 + 64, n_toks) AS BIGINT) AS tok_end
        FROM e ORDER BY doc_id, chunk_idx""")),
    Op("q_sample_topn", (s, d) => sampleTopN(s, d),
      Some("""
        SELECT doc_id, lang, CAST(rank AS BIGINT) AS rank FROM (
          SELECT doc_id, lang,
            row_number() OVER (PARTITION BY lang
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
          FROM documents)
        WHERE rank <= 50 ORDER BY doc_id""")),
    Op("q_pii_scrub", piiScrub,
      Some("""
        SELECT doc_id,
          len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
            AS n_emails,
          len(regexp_extract_all(t, '\b555-[0-9]{4}\b')) AS n_phones,
          regexp_replace(
            regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
              '<EMAIL>', 'g'),
            '\b555-[0-9]{4}\b', '<PHONE>', 'g') AS scrubbed
        FROM (
          SELECT doc_id,
            text || ' Contact user' || doc_id || '@mail.example.com or call 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.' AS t
          FROM documents)
        ORDER BY doc_id""")),
    Op("q_sample_stratified", stratifiedSample,
      Some("""
        SELECT doc_id, lang, source FROM documents
        WHERE CASE WHEN lang = 'en'
          THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '3'
          ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '7' END
        ORDER BY doc_id""")),
    Op("q_corpus_stats", corpusStats,
      Some("""
        SELECT lang, source, count(*) AS n_docs,
          CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
          CAST(sum(n_chars) AS BIGINT) AS total_chars,
          CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars
        FROM documents GROUP BY lang, source ORDER BY lang, source""")),
    Op("q_decontaminate", (s, d) => decontaminate(s, d),
      Some("""
        WITH w AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws,
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS b
          FROM documents),
        g AS (
          SELECT doc_id, b, unnest(list_transform(range(0, len(ws) - 7),
              i -> array_to_string(ws[i+1:i+8], ' '))) AS ng
          FROM w WHERE len(ws) >= 8),
        bench AS (SELECT DISTINCT ng FROM g WHERE b = 'f'),
        agg AS (
          SELECT g.doc_id,
            count(DISTINCT g.ng) AS n_ngrams,
            count(DISTINCT CASE WHEN bench.ng IS NOT NULL THEN g.ng END) AS n_hits
          FROM g LEFT JOIN bench ON g.ng = bench.ng
          WHERE g.b <> 'f'
          GROUP BY g.doc_id)
        SELECT d.doc_id,
          coalesce(a.n_ngrams, 0) AS n_ngrams,
          coalesce(a.n_hits, 0) AS n_hits,
          coalesce(a.n_hits, 0) > 0 AS contaminated
        FROM (SELECT doc_id FROM w WHERE b <> 'f') d
        LEFT JOIN agg a USING (doc_id)
        ORDER BY doc_id""")),
    Op("q_pipeline", (s, d) => pipeline(s, d),
      Some("""
        WITH surv AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM documents) WHERE rn = 1),
        gated AS (
          SELECT doc_id, lang, n_chars FROM surv
          WHERE len(string_split_regex(trim(text), '\s+')) >= 20
            AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '7'),
        packed AS (
          SELECT doc_id, lang, CAST(doc_id % 16 AS INT) AS shard,
            SUM(n_chars) OVER (PARTITION BY lang, doc_id % 16 ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - n_chars AS start_off
          FROM gated)
        SELECT doc_id, lang, shard,
          CAST(FLOOR(start_off / 4096.0) AS BIGINT) AS bin,
          CAST(start_off % 4096 AS BIGINT) AS bin_off
        FROM packed ORDER BY doc_id""")),
    Op("q_pack_sequences", (s, d) => packSequences(s, d),
      Some("""
        SELECT doc_id, lang, shard,
          CAST(FLOOR(start_off / 4096.0) AS BIGINT) AS bin,
          CAST(start_off % 4096 AS BIGINT) AS bin_off
        FROM (
          SELECT doc_id, lang, CAST(doc_id % 16 AS INT) AS shard,
            SUM(n_chars) OVER (PARTITION BY lang, doc_id % 16 ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - n_chars AS start_off
          FROM documents)
        ORDER BY doc_id""")))
}
