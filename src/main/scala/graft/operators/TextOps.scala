package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting, quality scoring, language ID,
  * content fingerprinting.
  *
  * Everything is built from codegen'd `sql.functions` (split /
  * regexp_extract_all / higher-order `aggregate`/`filter`) — zero UDFs, so
  * the whole pipeline stays inside WholeStageCodegen and scales linearly:
  * one narrow map stage, no shuffle at all until a downstream consumer
  * aggregates.
  *
  * The reference has no text analytics (it is an ingest POC); these extend
  * its enrichment stage (`jobs/S3ToParquetStreamJob.scala:66-76` adds
  * derived columns during ingest) with the derived columns an LLM-data
  * pipeline needs.
  */
object TextOps {

  /** Broadcast guard for the LM model tables. The tables are
    * n-gram-TYPE-bounded (Heaps' law), so they fit executor memory at any
    * test scale — but at a 100 TB web corpus trigram-type tables can
    * exceed driver/broadcast limits, and Spark's generic broadcast OOM
    * names neither the table nor the fix. 20M (ngram, count) rows ≈
    * low-hundreds of MB broadcast — safely under the driver heap while
    * far above anything a test corpus produces.
    */
  private[graft] val MaxBroadcastModelRows: Long = 20L * 1000 * 1000

  /** One cheap count over the TYPE table (bounded by vocabulary, not
    * corpus size) decides whether the model may broadcast; past the
    * guard the join auto-routes to the shuffle branch with a loud named
    * message instead of dying later in Spark's broadcast machinery.
    */
  private[graft] def fitsBroadcast(df: DataFrame, what: String, maxRows: Long): Boolean = {
    val n = df.agg(count(lit(1)).as("n")).head().getLong(0)
    if (n > maxRows)
      System.err.println(
        s"[graft] $what: $n model rows exceed the $maxRows-row broadcast " +
          "guard — auto-routing model joins through the shuffle branch " +
          "(the broadcastModel=false path); AQE re-broadcasts at runtime " +
          "only if the built side proves small")
    n <= maxRows
  }

  /** Whitespace tokens, with trim so engines agree on boundary empties. */
  private[graft] def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish lexer: runs of alphanumerics, or single non-space symbols. */
  private val BpePattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

  /** Tiny per-language stopword lists (top function words). Public-domain
    * common knowledge; enough signal for an n-gram/stopword heuristic.
    */
  private[graft] val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "por", "para"))

  private[graft] def stopHits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words.map(lit(_)): _*)))

  /** Token counts: whitespace tokens and BPE-ish lexer tokens. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(wsTokens(col("text"))).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  /** Quality scoring: length, token stats, punctuation/stopword ratios.
    * All ratios are single double divisions of exact integer counts, so
    * they are bitwise identical across engines.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(col("text"))
    val nChars = length(col("text"))
    val nToks = size(toks)
    val nPunct = size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0)))
    // case-SENSITIVE by contract (and by the DuckDB oracle) — the
    // lowercasing stopwordHits kernel is not a drop-in here
    val nStop = stopHits(toks, Stopwords("en"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        nChars.cast("long").as("n_chars"),
        nToks.cast("long").as("n_tokens"),
        (nChars.cast("double") / nToks.cast("double")).as("avg_token_len"),
        (nPunct.cast("double") / nChars.cast("double")).as("punct_ratio"),
        (nStop.cast("double") / nToks.cast("double")).as("stopword_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Language ID heuristic: stopword hits per candidate language (CJK
    * character ratio decides zh), deterministic alphabetical tiebreak.
    * Pure column expressions → a single codegen'd map; on 100 TB this is
    * a scan-speed pass.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    // one kernel pass for all five counters (see TextKernels) — the CJK
    // count previously ran as size(regexp_extract_all(...)), which
    // materializes an array of every CJK character per document just to
    // measure its length (17.9 task-CPU-seconds at sf0.1, the suite's
    // highest pure operator cost); the struct is referenced 5x so
    // CollapseProject leaves it alone
    val scored = Tables.spread(Tables.documents(spark, dir))
      .withColumn("sw", graft.functions.GraftFunctions.stopwordHits(col("text")))
      .withColumn("s_en", col("sw.s_en"))
      .withColumn("s_de", col("sw.s_de"))
      .withColumn("s_fr", col("sw.s_fr"))
      .withColumn("s_es", col("sw.s_es"))
      .withColumn("s_zh", col("sw.s_zh"))
    val best = greatest(col("s_en"), col("s_de"), col("s_fr"), col("s_es"), col("s_zh"))
    scored
      .select(
        col("doc_id"),
        when(best === 0, lit("und"))
          .when(col("s_de") === best, lit("de"))  // alphabetical among winners
          .when(col("s_en") === best, lit("en"))
          .when(col("s_es") === best, lit("es"))
          .when(col("s_fr") === best, lit("fr"))
          .otherwise(lit("zh")).as("lang_pred"),
        best.cast("long").as("lang_score"))
      .orderBy(col("doc_id"))
  }

  /** Polynomial rolling hash over the document's code points,
    * acc = (acc*31 + codepoint) mod 1e9+7. Order-dependent (a true
    * rolling fingerprint, not a bag-of-chars), exact 64-bit integer
    * arithmetic → engine-portable. Runs in the native
    * `graft_fingerprint` kernel: one codegen'd pass, no per-character
    * interpreted lambda.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        graft.functions.GraftFunctions.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** Repetition-based quality signals (the Gopher/MassiveText rules
    * adapted to word granularity): duplicate-word fraction
    * (1 - distinct/total) and top-bigram fraction (count of the most
    * frequent word bigram over all bigrams). A doc is `flagged` when
    * dup-word fraction > 0.3 OR top-bigram fraction > 0.1 — both tested
    * in EXACT integer arithmetic (cross-multiplied counts, no FP), so
    * the flag is bitwise identical across engines.
    *
    * Plan shape: one scan computes the per-doc word stats; the bigram
    * top-count needs a (doc_id, bigram) partial-agg shuffle — keys are
    * per-doc-unique so perfectly uniform, and the shuffled rows carry
    * counts, never text. At 100 TB this is scan + one well-keyed
    * aggregate, the same cost class as q_group_count.
    */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame =
    repetitionFrame(Tables.spread(Tables.documents(spark, dir)))

  private[graft] def repetitionFrame(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), wsTokens(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"),
        size(col("ws")).cast("long").as("n_words"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct_words"))
    val bigrams = docs.select(col("doc_id"),
      explode(graft.functions.GraftFunctions.wordNgrams(col("text"), 2)).as("bg"))
    val top = bigrams.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("tbc"), sum(col("c")).as("nbg"))
    base.select(col("doc_id"), col("n_words"), col("n_distinct_words"))
      .join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
        coalesce(col("tbc"), lit(0L)).as("top_bigram_count"),
        coalesce(col("nbg"), lit(0L)).as("n_bigrams"))
      .withColumn("flagged",
        (col("n_words") - col("n_distinct_words")) * 10 > col("n_words") * 3 ||
          col("top_bigram_count") * 10 > col("n_bigrams"))
      .orderBy(col("doc_id"))
  }

  /** Intra-document word dedup (boilerplate cleaning): keep each word's
    * FIRST occurrence, preserving order — the within-doc analog of the
    * cross-doc exact dedup, and a standard cleanup before tokenization.
    *
    * Plan shape: the KERNEL is a pure per-row map — `array_distinct`
    * keeps first occurrences in order, so the dedup itself is ONE
    * codegen'd projection with no shuffle (an explode→window formulation
    * would shuffle every token occurrence in the corpus — at 100 TB that
    * is the difference between scan speed and the largest shuffle in the
    * pipeline). The trailing `orderBy(doc_id)` is NOT part of the op: it
    * exists for deterministic oracle comparison and costs a range
    * exchange + sort — a pipeline composing this operator should take
    * [[dedupWordsFrame]] minus the sort (at scale the sort would be the
    * entire cost of the stage). The two-step select keeps the distinct
    * array computed once (CollapseProject leaves multi-referenced exprs
    * alone).
    */
  def dedupWords(spark: SparkSession, dir: String): DataFrame =
    dedupWordsFrame(Tables.documents(spark, dir))

  private[graft] def dedupWordsFrame(docs: DataFrame): DataFrame =
    docs
      // null text carries no words: drop the doc, matching both the
      // explode-based formulation and the DuckDB oracle's unnest
      .filter(col("text").isNotNull)
      .select(col("doc_id"), array_distinct(wsTokens(col("text"))).as("__u"))
      .select(col("doc_id"),
        size(col("__u")).cast("long").as("n_unique"),
        array_join(col("__u"), " ").as("deduped"))
      .orderBy(col("doc_id"))

  /** Corpus token document-frequency + IDF — the corpus-level statistic
    * quality scoring and rare-token filtering build on. Returns the topK
    * tokens by df (ties broken by token, so the LIMIT is deterministic)
    * with idf = ln((N+1)/(df+1)).
    *
    * Scale shape: `array_distinct` dedups within each doc as a per-row
    * map (NO (doc, token) distinct shuffle — at 100 TB that distinct is
    * the largest shuffle a naive formulation pays), so the only wide
    * exchange is the groupBy(token) count with map-side partials. The
    * corpus total rides a broadcast of a 1-row aggregate, not a driver
    * action.
    */
  def docFrequency(spark: SparkSession, dir: String,
      minDf: Long = 5, topK: Int = 200): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val perDocTokens = Tables.spread(docs)
      .select(col("doc_id"), explode(array_distinct(wsTokens(col("text")))).as("token"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    perDocTokens
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(total))
      .withColumn("idf", log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))))
      .select(col("token"), col("df"), col("idf"))
      .orderBy(col("df").desc, col("token"))
      .limit(topK)
  }

  /** Unigram log-probability quality score — the Spark-friendly
    * public-knowledge analog of the KenLM-perplexity filters production
    * corpus pipelines run (CCNet-style): score each document by the mean
    * ln p(token) under the corpus's own unigram distribution. Documents
    * full of corpus-typical tokens score high; line noise and
    * out-of-distribution boilerplate score low.
    *
    * Scale shape: the frequency table comes from ONE map-side-partial
    * groupBy over the exploded tokens; the corpus token total rides a
    * broadcast 1-row aggregate. Scoring then joins the exploded
    * (doc, token) rows to the frequency table keyed on token — and THAT
    * key is maximally skewed at corpus scale: "the" appears in a fixed
    * fraction of all tokens, so a shuffle join sends a fixed fraction of
    * 100 TB to one reducer. Two branches:
    *
    *  - `broadcastVocab = true` (default): the frequency table is
    *    broadcast — a natural-language vocabulary is bounded (whitespace
    *    vocab grows ~O(corpus^0.5), Heaps' law; min-df pruning bounds it
    *    harder), so the (token, count) table stays executor-memory-sized
    *    while the corpus doesn't. The token stream never shuffles on the
    *    token key — no skew, and each doc's mean aggregates map-side
    *    partially, so the only exchange carries one row per (partition,
    *    doc).
    *  - `broadcastVocab = false`: the shuffle join, for vocabularies that
    *    genuinely scale with the corpus (byte-level tokens, no pruning).
    *    AQE's skew-split handles the hot keys, and AQE itself converts
    *    the join back to broadcast at runtime if the built table turns
    *    out small — the fallback is adaptive, just not skew-free by
    *    construction.
    */
  def unigramLogProb(spark: SparkSession, dir: String,
      broadcastVocab: Boolean = true,
      maxBroadcastRows: Long = MaxBroadcastModelRows): DataFrame = {
    val toks = Tables.spread(Tables.documents(spark, dir))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("t"))
    // the model table is consumed twice (broadcast-size guard, scoring
    // join); persisting it caches the type-BOUNDED aggregate, never the
    // exploded token stream — each re-use otherwise re-runs the full
    // explode+shuffle.
    // NOTE (lifecycle, applies to every LM-model persist() in this
    // file): these handles are deliberately NOT unpersisted at query
    // end — the returned DataFrame is lazy, so an eager unpersist would
    // evict the cache before the caller's action consumes it, and a
    // deferred one needs a listener keyed to a plan this module no
    // longer owns. The frames are KB-to-MB model tables in short-lived
    // driver/bench sessions; a long-lived session relies on
    // ContextCleaner GC once the plan handle drops, which bounds the
    // leak to the model-table tier (never the exploded token stream).
    val freq = toks.groupBy(col("t")).agg(count(lit(1)).as("c")).persist()
    val total = toks.agg(count(lit(1)).as("n_total"))
    val bcVocab = broadcastVocab &&
      fitsBroadcast(freq, "unigramLogProb vocabulary", maxBroadcastRows)
    toks.join(if (bcVocab) broadcast(freq) else freq, "t")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        // round like [[bm25]]: the driver compare sorts rows with this
        // float as the FIRST key, and last-ulp sum-association drift
        // between engines would reorder near-tied docs
        round(sum(log(col("c").cast("double") / col("n_total"))) / count(lit(1)), 9)
          .as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  /** Interpolated BIGRAM LM quality score — one model order past
    * [[unigramLogProb]], the Spark-friendly analog of the KenLM
    * perplexity filter CCNet uses (Wenzek et al. 2020): score each doc
    * by the mean ln(0.7·p(tᵢ|tᵢ₋₁) + 0.3·p(tᵢ)) over its bigram
    * positions, with both model tables estimated FROM the corpus
    * itself. Jelinek-Mercer interpolation (fixed weights, written as
    * exact literals in both engines) keeps unseen-context backoff
    * smooth without discounting state.
    *
    * Distributed shape: bigram strings come from the codegen'd
    * [[graft.functions.GraftFunctions.wordNgrams]] kernel (no
    * interpreted higher-order functions in the hot path); the bigram /
    * context / unigram tables are each ONE map-side-partial groupBy.
    * Scoring joins are broadcast by default — bigram vocabulary grows
    * sub-linearly (Heaps' law) and the model tables are the same ones a
    * KenLM job would broadcast as a binary — with `broadcastModel =
    * false` as the explicit shuffle-join fallback for a corpus whose
    * bigram table outgrows executor memory; both branches spec-pinned
    * equal. p(tᵢ|tᵢ₋₁) = c₂(tᵢ₋₁tᵢ) / Σ_b c₂(tᵢ₋₁b): the context
    * normalizer is derived from the bigram table itself so the two
    * tables can never disagree about totals. Docs with < 2 tokens have
    * no bigram positions and drop out (inner-join semantics, same in
    * the oracle).
    */
  def bigramLogProb(spark: SparkSession, dir: String,
      broadcastModel: Boolean = true,
      maxBroadcastRows: Long = MaxBroadcastModelRows): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir))
      .filter(col("text").isNotNull)
    val toks = docs.select(col("doc_id"), explode(wsTokens(col("text"))).as("t"))
    val uniFreq = toks.groupBy(col("t")).agg(count(lit(1)).as("c1"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    val bis = docs.select(col("doc_id"),
      explode(graft.functions.GraftFunctions.wordNgrams(col("text"), 2)).as("bg"))
    // type-bounded model table, consumed three times (guard count,
    // ctxFreq derivation, scoring join) — persist so the ngram
    // explode+shuffle runs once
    val biFreq = bis.groupBy(col("bg")).agg(count(lit(1)).as("c2")).persist()
    // guard on the LARGEST model table only (bigram types); uniFreq and
    // ctxFreq are order-bounded by it, so one count decides for all three
    val useBc = broadcastModel &&
      fitsBroadcast(biFreq, "bigramLogProb bigram-type table", maxBroadcastRows)
    def bc(df: DataFrame): DataFrame = if (useBc) broadcast(df) else df
    val ctxFreq = biFreq
      .groupBy(substring_index(col("bg"), " ", 1).as("ctx"))
      .agg(sum(col("c2")).as("c1ctx"))
    bis
      .join(bc(biFreq), "bg")
      .withColumn("ctx", substring_index(col("bg"), " ", 1))
      .withColumn("nxt", substring_index(col("bg"), " ", -1))
      .join(bc(ctxFreq), "ctx")
      .join(bc(uniFreq.withColumnRenamed("t", "nxt")), "nxt")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        // rounded for the same row-sort-stability reason as avg_logprob
        round(sum(log(
          lit(0.7) * (col("c2").cast("double") / col("c1ctx").cast("double")) +
            lit(0.3) * (col("c1").cast("double") / col("n_total").cast("double"))))
          / count(lit(1)), 9).as("avg_bi_logprob"))
      .orderBy(col("doc_id"))
  }

  /** Interpolated Kneser-Ney trigram scoring (Kneser & Ney 1995; the
    * Chen & Goodman 1998 interpolated formulation, single discount
    * D=0.75) — the LM the n-gram-era quality filters actually used,
    * trained on the corpus and scoring it in one plan. Definitions the
    * DuckDB oracle mirrors term for term:
    *
    *  - c3(w1w2w3), c2(w1w2)=Σ c3, b3(w1w2)=|{w3: c3>0}|
    *  - n3(w2w3)=|{w1: c3>0}|, n3mid(w2)=Σ_w3 n3, b2(w2)=|{w3: n3>0}|
    *  - n2(w3)=|{w: corpus bigram (w,w3) occurs}|, N=|bigram types|
    *  - P1(w3)=n2/N (the continuation unigram — KN's defining idea:
    *    "how many contexts does w3 complete", not "how often")
    *  - P2(w3|w2)=(max(n3−D,0)+D·b2·P1)/n3mid
    *  - P3(w3|w1w2)=(max(c3−D,0)+D·b3·P2)/c2
    *
    * Scored trigrams come from the training corpus itself, so every
    * denominator is positive by construction. Scale shape: the model
    * tables are n-gram-TYPE-bounded aggregations (broadcast by default,
    * `broadcastModel=false` for the shuffle-join route when the type
    * tables outgrow the driver), scoring is per-occurrence joins — the
    * [[bigramLogProb]] plan one order higher.
    */
  def knTrigramLogProb(spark: SparkSession, dir: String,
      discount: Double = 0.75, broadcastModel: Boolean = true,
      maxBroadcastRows: Long = MaxBroadcastModelRows): DataFrame = {
    val d = lit(discount)
    val docs = Tables.spread(Tables.documents(spark, dir))
      .filter(col("text").isNotNull)
    val tris = docs.select(col("doc_id"),
        explode(graft.functions.GraftFunctions.wordNgrams(col("text"), 3)).as("tg"))
      .select(col("doc_id"),
        substring_index(col("tg"), " ", 1).as("w1"),
        substring_index(substring_index(col("tg"), " ", 2), " ", -1).as("w2"),
        substring_index(col("tg"), " ", -1).as("w3"))
    // type-bounded model table consumed FIVE times (broadcast guard,
    // ctx3/n3 derivations — mid derives from n3 — and the scoring
    // join): without the persist each use re-runs the trigram
    // explode+aggregation over the whole corpus (measured: 87 CPU-s at
    // sf0.1, the heaviest query in the suite)
    val c3 = tris.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c3")).persist()
    // guard on the trigram-type table — the largest of the five model
    // tables (ctx3/n3/mid are its aggregations; n2 is bigram-type-sized)
    val useBc = broadcastModel &&
      fitsBroadcast(c3, "knTrigramLogProb trigram-type table", maxBroadcastRows)
    def bc(df: DataFrame): DataFrame = if (useBc) broadcast(df) else df
    val ctx3 = c3.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c3")).as("c2"), count(lit(1)).as("b3"))
    val n3 = c3.groupBy(col("w2"), col("w3")).agg(count(lit(1)).as("n3"))
    val mid = n3.groupBy(col("w2"))
      .agg(sum(col("n3")).as("n3mid"), count(lit(1)).as("b2"))
    val bis = docs.select(
      explode(graft.functions.GraftFunctions.wordNgrams(col("text"), 2)).as("bg"))
    val bgTypes = bis.select(
        substring_index(col("bg"), " ", 1).as("bw1"),
        substring_index(col("bg"), " ", -1).as("bw2"))
      .distinct().persist() // feeds n2 AND the type total
    val n2 = bgTypes.groupBy(col("bw2").as("w3")).agg(count(lit(1)).as("n2"))
    val nTypes = bgTypes.agg(count(lit(1)).as("n_bg_types"))
    val p1 = col("n2").cast("double") / col("n_bg_types").cast("double")
    val p2 = (greatest(col("n3").cast("double") - d, lit(0.0)) +
      d * col("b2").cast("double") * p1) / col("n3mid").cast("double")
    val p3 = (greatest(col("c3").cast("double") - d, lit(0.0)) +
      d * col("b3").cast("double") * p2) / col("c2").cast("double")
    tris
      .join(bc(c3), Seq("w1", "w2", "w3"))
      .join(bc(ctx3), Seq("w1", "w2"))
      .join(bc(n3), Seq("w2", "w3"))
      .join(bc(mid), Seq("w2"))
      .join(bc(n2), Seq("w3"))
      .crossJoin(broadcast(nTypes))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_trigrams"),
        round(sum(log(p3)) / count(lit(1)), 9).as("avg_kn_logprob"))
      .orderBy(col("doc_id"))
  }

  /** CCNet-style perplexity BUCKETING (Wenzek et al. 2020 §4.3): score
    * every document by LM perplexity — here the corpus-estimated
    * unigram model of [[unigramLogProb]], ppl = −mean ln p(token) —
    * and split the corpus into `head` / `middle` / `tail` at the
    * corpus's own `lo`/`hi` perplexity quantiles. The head (lowest
    * perplexity = most corpus-typical) is what CCNet keeps for LM
    * training data; the tail is the noise shelf.
    *
    * Scale shape: scoring is [[unigramLogProb]]'s broadcast-vocabulary
    * plan (no token-key shuffle); the thresholds are ONE aggregation
    * over a single double per document broadcast back, and bucket
    * assignment is a pure projection — no global sort, no single-
    * partition `ntile` window. `exactThresholds = true` (default) uses
    * Spark's exact interpolated `percentile` — distinct-score-bounded
    * memory, right for oracle-exact equality and fine into the TB
    * range; `false` swaps in `approx_percentile` (a fixed-memory
    * sketch) for a corpus where even the distinct score set is huge —
    * CCNet itself fits thresholds on a sample. The spec pins the two
    * branches' bucket counts within tolerance.
    */
  def perplexityBuckets(spark: SparkSession, dir: String,
      lo: Double = 1.0 / 3, hi: Double = 2.0 / 3,
      exactThresholds: Boolean = true): DataFrame = {
    require(0 < lo && lo < hi && hi < 1,
      s"perplexityBuckets: need 0 < lo < hi < 1, got ($lo, $hi)")
    // one slim row per doc (id, token count, score), consumed twice —
    // threshold fit and bucket assignment — so persist rather than
    // re-run the whole scoring plan; CCNet materializes scores the
    // same way before fitting its cutoffs
    val scored = unigramLogProb(spark, dir)
      .withColumn("ppl", -col("avg_logprob")).persist()
    val th =
      if (exactThresholds)
        scored.agg(percentile(col("ppl"), array(lit(lo), lit(hi))).as("th"))
      else
        scored.agg(approx_percentile(col("ppl"), array(lit(lo), lit(hi)),
          lit(10000)).as("th"))
    scored.crossJoin(broadcast(th))
      .select(col("doc_id"), col("n_tokens"), col("ppl"),
        when(col("ppl") <= col("th")(0), lit("head"))
          .when(col("ppl") <= col("th")(1), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** Text normalization battery — the standard pre-tokenization cleanup
    * pass: Unicode NFC composition (the `graft_nfc` codegen'd kernel —
    * Spark has no built-in normalizer; DuckDB's native `nfc_normalize`
    * is the oracle side), lowercasing, whitespace-run collapse, and
    * trim, with a changed flag and the character delta. A pure per-row
    * projection: zero shuffle, scan-speed at 100 TB. Normalization
    * BEFORE tokenization is what keeps "café" (NFC) and "café" (NFD)
    * from becoming distinct vocabulary entries.
    */
  def normalizeText(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      lower(graft.functions.GraftFunctions.nfc(col("text"))), "\\s+", " "))
    Tables.documents(spark, dir)
      .select(col("doc_id"), norm.as("norm"),
        (norm =!= col("text")).as("changed"),
        (length(col("text")) - length(norm)).cast("long").as("len_delta"))
      .orderBy(col("doc_id"))
  }

  /** Loud ceiling for the driver-collected boilerplate set. Lines
    * shared verbatim by >= minDocs documents are bounded template
    * vocabulary by construction (headers, footers, nav chrome), not
    * corpus-sized content — but if a corpus breaks that assumption the
    * guard fails loudly instead of OOMing the driver; the join
    * fallback handles unbounded sets.
    */
  private[graft] val MaxBoilerplateLines = 200000

  /** Corpus-level boilerplate-line removal — the line-dedup cleanup
    * pass of public web-corpus pipelines (CCNet, RefinedWeb): a line
    * whose trimmed form appears in >= `minDocs` distinct documents is
    * template chrome and is stripped from EVERY document; remaining
    * lines keep their original order and spelling. (The reference has
    * no text-pipeline surface; this extends the mandated LLM family.)
    *
    * Scale shape, same discipline as [[Dedup.duplicatedSpans]]:
    * per-doc distinctness is ROW-LOCAL (`array_distinct` before the
    * explode), so the ONE aggregation counts docs-per-line with
    * map-side partials and the shuffle carries only distinct
    * (line, partial-count) rows. The rewrite is then a PURE PROJECTION
    * against the collected boilerplate set (bounded, guarded by
    * [[MaxBoilerplateLines]]) — zero corpus shuffle. `broadcastSet =
    * false` routes the rewrite through a broadcast anti-join +
    * ordered re-assembly instead, the path for a corpus whose
    * template set outgrows a driver literal; the spec pins both
    * branches equal.
    */
  def stripBoilerplate(spark: SparkSession, dir: String,
      minDocs: Int = 3, broadcastSet: Boolean = true): DataFrame =
    stripBoilerplateFrame(
      Tables.documents(spark, dir).filter(col("text").isNotNull),
      minDocs, broadcastSet)

  private[graft] def stripBoilerplateFrame(docs: DataFrame,
      minDocs: Int, broadcastSet: Boolean): DataFrame = {
    require(minDocs >= 2, s"boilerplate needs minDocs >= 2, got $minDocs")
    val ls = split(col("text"), "\n")
    val keys = array_distinct(filter(transform(ls, l => trim(l)), k => k =!= ""))
    val freq = Tables.spread(docs).select(explode(keys).as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
    if (broadcastSet) {
      val bl = freq.select(col("key")).collect().map(_.getString(0)).sorted
      require(bl.length <= MaxBoilerplateLines,
        s"boilerplate set ${bl.length} exceeds $MaxBoilerplateLines — " +
          "use broadcastSet = false (anti-join path) for this corpus")
      val blLit = typedlit(bl)
      val kept = filter(ls, l => !array_contains(blLit, trim(l)))
      docs.select(col("doc_id"),
          concat_ws("\n", kept).as("cleaned"),
          size(kept).cast("long").as("n_kept"))
        .orderBy(col("doc_id"))
    } else {
      val lines = Tables.spread(docs)
        .select(col("doc_id"), posexplode(ls).as(Seq("pos", "line")))
      val keptLines = lines.join(broadcast(freq.select(col("key"))),
        trim(col("line")) === col("key"), "left_anti")
      val rebuilt = keptLines.groupBy(col("doc_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")).as("kls"))
        .select(col("doc_id"), concat_ws("\n", col("kls")).as("cleaned"),
          size(col("kls")).cast("long").as("n_kept"))
      // docs whose every line was boilerplate drop out of the join —
      // restore them as empty
      docs.select(col("doc_id")).join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("cleaned"), lit("")).as("cleaned"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy(col("doc_id"))
    }
  }

  /** In-engine multinomial Naive Bayes text classifier — the relational
    * spelling of the fastText-style quality classifier every public
    * LLM-data pipeline trains and applies at corpus scale (CCNet's
    * fastText langid, GPT-3/LLaMA/Gopher's quality classifier over web
    * pages vs curated reference text). Training IS aggregation here:
    * the model is the per-token class-conditional count table, so one
    * map-side-partial groupBy over the labeled split trains it, and
    * scoring is a broadcast join + per-doc log-sum — no driver-side
    * learning loop, no collect of anything unbounded.
    *
    * `labeled` carries (doc_id, pos, text). Docs with `doc_id % 5 != 0`
    * are the labeled training split; ALL docs are scored (so the
    * `doc_id % 5 == 0` rows are genuine held-out predictions). Laplace
    * add-one smoothing on both the token table and the class prior;
    * unseen tokens get the smoothed floor via the left join's coalesce.
    * Per-token weight is the log-likelihood ratio
    * ln p(t|pos) − ln p(t|neg), so the doc score is one sum and the
    * decision is `log_odds > 0`.
    *
    * Scale shape: the model table is vocabulary-sized (Heaps' law —
    * sub-linear in corpus size) and broadcast by default, exactly the
    * artifact a fastText job ships to executors as a binary;
    * `broadcastModel = false` is the shuffle-join fallback for a vocab
    * that outgrows executor memory, spec-pinned equal. The three scalar
    * side-frames (token totals, vocab size, prior) are one-row
    * broadcasts. Everything else is scan + ONE partial-agg shuffle per
    * table — the same plan at 100 TB, with the scoring pass remaining
    * embarrassingly parallel.
    */
  private[graft] def nbClassifierFrame(labeled: DataFrame,
      broadcastModel: Boolean): DataFrame = {
    def bc(df: DataFrame): DataFrame = if (broadcastModel) broadcast(df) else df
    val docs = Tables.spread(labeled)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("pos"), wsTokens(lower(col("text"))).as("ts"))
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val model = train.select(col("pos"), explode(col("ts")).as("t"))
      .groupBy(col("t")).agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("cpos"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("cneg"))
    val tot = model.agg(
      sum(col("cpos")).as("tpos"), sum(col("cneg")).as("tneg"),
      count(lit(1)).as("v"))
    val prior = train.agg(
      log((sum(when(col("pos"), 1L).otherwise(0L)) + lit(1.0)) /
        (sum(when(!col("pos"), 1L).otherwise(0L)) + lit(1.0))).as("lp"))
    val llr =
      log((coalesce(col("cpos"), lit(0L)) + lit(1.0)) / (col("tpos") + col("v"))) -
        log((coalesce(col("cneg"), lit(0L)) + lit(1.0)) / (col("tneg") + col("v")))
    docs.select(col("doc_id"), col("pos"), explode(col("ts")).as("t"))
      .join(bc(model), Seq("t"), "left")
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"), col("pos"))
      .agg(count(lit(1)).as("n_tokens"), sum(llr).as("s"))
      .crossJoin(broadcast(prior))
      .select(col("doc_id"), col("n_tokens"),
        (col("s") + col("lp")).as("log_odds"),
        (col("s") + col("lp") > 0).as("predicted"),
        ((col("s") + col("lp") > 0) === col("pos")).as("correct"))
      .orderBy(col("doc_id"))
  }

  /** BM25 keyword search over the corpus (Robertson-Spärck Jones
    * probabilistic ranking, the Okapi BM25 form with Lucene's
    * +1-inside-the-log IDF so scores stay positive) — the retrieval
    * primitive a training-data pipeline uses for corpus inspection and
    * keyword-driven decontamination sweeps. Standard constants k1=1.2,
    * b=0.75.
    *
    * Scale shape: term frequencies are computed ONLY for the query's
    * terms (the isin filter lands before the aggregation, so the
    * (doc, term) shuffle carries hits, not the corpus vocabulary);
    * document lengths are row-local; the per-term df table and the
    * two corpus scalars broadcast. One ranking sort of the hit set.
    * avgdl is derived as exact-integer sum/count so both engines
    * compute the identical double; the final score rounds to 9
    * decimals so last-ulp log/summation drift can never reorder the
    * ranking across engines (doc_id breaks genuine ties).
    */
  def bm25(spark: SparkSession, dir: String,
      query: Seq[String] = Seq("filter", "merge", "dup"), k: Int = 20): DataFrame = {
    require(query.nonEmpty, "bm25: empty query")
    val docs = Tables.spread(Tables.documents(spark, dir))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), wsTokens(lower(col("text"))).as("ts"))
    val lens = docs.select(col("doc_id"), size(col("ts")).cast("long").as("dl"))
    val tot = lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sumdl"))
    val tf = docs.select(col("doc_id"), explode(col("ts")).as("t"))
      .filter(col("t").isin(query: _*))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val avgdl = col("sumdl").cast("double") / col("n_docs")
    val contrib =
      log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
        (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / avgdl))
    tf.join(broadcast(dfreq), "t")
      .join(lens, "doc_id")
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id")).agg(round(sum(contrib), 9).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** EXACT corpus-wide heavy hitters at sketch cost — the classic
    * two-pass protocol over [[graft.functions.FreqItemsAgg]]
    * (Misra–Gries, mergeable): pass 1 reduces the corpus to ≤ k
    * candidate tokens with ONE O(k)-per-task aggregate (no
    * vocabulary-sized shuffle — each partition ships one k-entry
    * summary), pass 2 recounts ONLY the candidates exactly (broadcast
    * isin filter, the [[bm25]] shuffle shape: hits, not vocabulary).
    * The MG guarantee — every token with true count > total/(k+1) is in
    * the candidate set — makes the final top-N EXACT whenever rank N
    * clears that threshold; `capture_ok` carries the proof in-plan, and
    * the DuckDB oracle recomputes the exact top-N from scratch. At
    * 100 TB this is hot-token/hot-domain detection without ever
    * materializing the vocabulary.
    */
  def heavyHitters(spark: SparkSession, dir: String,
      k: Int = 4096, topN: Int = 50): DataFrame = {
    require(k >= topN, s"sketch width $k must cover topN=$topN")
    val toks = Tables.spread(Tables.documents(spark, dir))
      .filter(col("text").isNotNull)
      .select(explode(wsTokens(col("text"))).as("tok"))
    val first = toks.agg(
      org.apache.spark.sql.GraftShim.column(
        graft.functions.FreqItemsAgg(
          org.apache.spark.sql.GraftShim.expression(col("tok")), k)
          .toAggregateExpression()).as("cand"),
      count(lit(1)).as("total")).collect()(0)
    val cands = first.getSeq[String](0)
    val total = first.getLong(1)
    toks.filter(col("tok").isin(cands: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(topN)
      .withColumn("capture_ok",
        col("cnt").cast("double") > lit(total.toDouble / (k + 1)))
  }

  /** Count-min frequency estimates, ANCHORED AUDIT: one fixed-size
    * sketch absorbs every whitespace token of the corpus (the shuffle
    * carries depth·width counters per partition, never the
    * vocabulary), then the exact top-N tokens — the anchor, recomputed
    * in the SAME plan — probe it. The contract a driver oracle can
    * hash: estimates are one-sided (`est >= exact` always) and within
    * the CM guarantee's additive slack ceil((e/width)·N) (holds
    * deterministically for the fixed seed + corpus; probability
    * ≤ depth·e^(−depth) per probe in general). Collecting the sketch
    * is O(depth·width) ≈ 80 KB — the point of a sketch is that this
    * never grows with the corpus.
    */
  def cmFrequencies(spark: SparkSession, dir: String,
      depth: Int = 5, width: Int = 2048, topN: Int = 20): DataFrame = {
    val toks = Tables.spread(Tables.documents(spark, dir))
      .filter(col("text").isNotNull)
      .select(explode(wsTokens(col("text"))).as("tok"))
    val cells = toks.agg(
      org.apache.spark.sql.GraftShim.column(
        graft.functions.CountMinAgg(
          org.apache.spark.sql.GraftShim.expression(col("tok")), depth, width)
          .toAggregateExpression()).as("sketch"))
      .collect()(0).getSeq[Long](0)
    val slack = graft.functions.CountMin.slack(cells, depth, width)
    val est = udf((t: String) =>
      graft.functions.CountMin.estimate(cells, depth, width, t))
    // exact anchor: top-N by true count, deterministic tie-break
    toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok"))
      .limit(topN)
      .withColumn("within_bounds",
        est(col("tok")) >= col("n_exact") &&
          est(col("tok")) <= col("n_exact") + lit(slack))
      .select(col("tok"), col("n_exact"), col("within_bounds"))
      .orderBy(col("n_exact").desc, col("tok"))
  }

  /** Driver-graded classifier run over a SPAM-PLANTED corpus: the
    * synthetic documents draw from one shared vocabulary regardless of
    * their `lang`/`source` columns (no metadata label is learnable from
    * tokens), so the registered query plants the separable signal a real
    * quality-classification job has — every third document gets the
    * low-quality chrome suffix web spam actually carries, and the label
    * is that planting. The classifier must learn the spam vocabulary
    * from the training split and flag the held-out planted docs. The
    * DuckDB oracle replays the same staging and the full
    * train-smooth-score pipeline from scratch.
    */
  def nbClassifier(spark: SparkSession, dir: String,
      broadcastModel: Boolean = true): DataFrame =
    nbClassifierFrame(
      Tables.documents(spark, dir).filter(col("text").isNotNull)
        .select(col("doc_id"), (col("doc_id") % 3 === 0).as("pos"),
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" click here buy now free offer")))
            .otherwise(col("text")).as("text")),
      broadcastModel)

  /** Driver-graded boilerplate strip over a CHROME-WRAPPED corpus: the
    * synthetic documents have no naturally repeated lines (every
    * trimmed line is corpus-unique at every SF), so the registered
    * query plants the template shape web corpora actually have — a
    * per-source header line and a global footer line around every doc —
    * and the strip must remove exactly those (every source has >=
    * minDocs docs) while reconstructing the original text byte-exact.
    * The DuckDB oracle replays the same wrap + full pipeline from
    * scratch; nothing about "the chrome is what gets stripped" is
    * assumed on either side.
    */
  def stripBoilerplateStaged(spark: SparkSession, dir: String): DataFrame =
    stripBoilerplateFrame(
      Tables.documents(spark, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          concat(lit("== "), col("source"), lit(" =="), lit("\n"),
            col("text"), lit("\nCorpus chrome footer")).as("text")),
      minDocs = 3, broadcastSet = true)

  val ops: Seq[Op] = Seq(
    Op("q_text_heavy", (s, d) => heavyHitters(s, d),
      Some("""
        WITH toks AS (
          SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
          FROM documents WHERE text IS NOT NULL),
        tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM toks),
        cnts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
        SELECT tok, cnt, CAST(cnt AS DOUBLE) > total / 4097 AS capture_ok
        FROM cnts, tot ORDER BY cnt DESC, tok LIMIT 50""")),
    Op("q_text_cms", (s, d) => cmFrequencies(s, d),
      Some("""
        WITH toks AS (
          SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
          FROM documents WHERE text IS NOT NULL)
        SELECT tok, count(*) AS n_exact, true AS within_bounds
        FROM toks GROUP BY tok
        ORDER BY n_exact DESC, tok LIMIT 20""")),
    Op("q_text_bm25", (s, d) => bm25(s, d),
      Some("""
        WITH docs AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
          FROM documents WHERE text IS NOT NULL),
        lens AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM docs),
        tot AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sumdl
                FROM lens),
        tf AS (
          SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf
          FROM (SELECT doc_id, unnest(ts) AS t FROM docs)
          WHERE t IN ('filter', 'merge', 'dup')
          GROUP BY doc_id, t),
        dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t)
        SELECT doc_id,
               round(sum(
                 ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
                   (tf * 2.2) /
                   (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl /
                     (CAST(sumdl AS DOUBLE) / n_docs)))), 9) AS score
        FROM tf JOIN dfreq USING (t) JOIN lens USING (doc_id), tot
        GROUP BY doc_id
        ORDER BY score DESC, doc_id
        LIMIT 20""")),
    Op("q_text_classify", (s, d) => nbClassifier(s, d),
      Some("""
        WITH staged AS (
          SELECT doc_id, doc_id % 3 = 0 AS pos,
                 CASE WHEN doc_id % 3 = 0
                      THEN text || ' click here buy now free offer'
                      ELSE text END AS text
          FROM documents WHERE text IS NOT NULL),
        docs AS (
          SELECT doc_id, pos,
                 string_split_regex(trim(lower(text)), '\s+') AS ts
          FROM staged),
        train AS (SELECT * FROM docs WHERE doc_id % 5 <> 0),
        model AS (
          SELECT t,
                 sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cpos,
                 sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS cneg
          FROM (SELECT pos, unnest(ts) AS t FROM train) GROUP BY t),
        tot AS (
          SELECT CAST(sum(cpos) AS BIGINT) AS tpos,
                 CAST(sum(cneg) AS BIGINT) AS tneg,
                 count(*) AS v
          FROM model),
        prior AS (
          SELECT ln((sum(CASE WHEN pos THEN 1 ELSE 0 END) + 1.0) /
                    (sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) + 1.0)) AS lp
          FROM train),
        scored AS (
          SELECT doc_id, pos, count(*) AS n_tokens,
            sum(ln((coalesce(cpos, 0) + 1.0) / (tpos + v)) -
                ln((coalesce(cneg, 0) + 1.0) / (tneg + v))) AS s
          FROM (SELECT doc_id, pos, unnest(ts) AS t FROM docs)
          LEFT JOIN model USING (t), tot
          GROUP BY doc_id, pos)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               s + lp AS log_odds,
               (s + lp) > 0 AS predicted,
               ((s + lp) > 0) = pos AS correct
        FROM scored, prior
        ORDER BY doc_id""")),
    Op("q_strip_boilerplate", stripBoilerplateStaged,
      Some("""
        WITH parts AS (
          SELECT doc_id, string_split(
            '== ' || source || ' ==' || chr(10) || text || chr(10) ||
            'Corpus chrome footer', chr(10)) AS ls
          FROM documents WHERE text IS NOT NULL),
        keys AS (
          SELECT doc_id, unnest(list_distinct(list_filter(
            list_transform(ls, l -> trim(l)), k -> k <> ''))) AS key
          FROM parts),
        freq AS (SELECT key, count(*) AS nd FROM keys GROUP BY key),
        bl AS (
          SELECT coalesce(list(key), CAST([] AS VARCHAR[])) AS bls
          FROM freq WHERE nd >= 3),
        clean AS (
          SELECT doc_id,
                 list_filter(ls, l -> NOT list_contains(b.bls, trim(l))) AS kls
          FROM parts, bl b)
        SELECT doc_id, array_to_string(kls, chr(10)) AS cleaned,
               CAST(len(kls) AS BIGINT) AS n_kept
        FROM clean ORDER BY doc_id""")),
    Op("q_text_normalize", normalizeText,
      Some("""
        WITH n AS (
          SELECT doc_id, text,
            trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS norm
          FROM documents)
        SELECT doc_id, norm, norm <> text AS changed,
               CAST(length(text) - length(norm) AS BIGINT) AS len_delta
        FROM n ORDER BY doc_id""")),
    Op("q_ppl_buckets", (s, d) => perplexityBuckets(s, d),
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
          FROM documents WHERE text IS NOT NULL),
        freq AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
        tot AS (SELECT count(*) AS n_total FROM toks),
        scored AS (
          SELECT doc_id, count(*) AS n_tokens,
                 -round(sum(ln(CAST(c AS DOUBLE) / n_total)) / count(*), 9) AS ppl
          FROM toks JOIN freq USING (t), tot
          GROUP BY doc_id),
        th AS (SELECT quantile_cont(ppl, 1.0/3) AS t1,
                      quantile_cont(ppl, 2.0/3) AS t2 FROM scored)
        SELECT doc_id, n_tokens, ppl,
               CASE WHEN ppl <= t1 THEN 'head'
                    WHEN ppl <= t2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM scored, th ORDER BY doc_id""")),
    Op("q_text_logprob", (s, d) => unigramLogProb(s, d),
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
          FROM documents WHERE text IS NOT NULL),
        freq AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
        tot AS (SELECT count(*) AS n_total FROM toks)
        SELECT doc_id, count(*) AS n_tokens,
               round(sum(ln(CAST(c AS DOUBLE) / n_total)) / count(*), 9) AS avg_logprob
        FROM toks JOIN freq USING (t), tot
        GROUP BY doc_id
        ORDER BY doc_id""")),
    Op("q_text_logprob_kn", (s, d) => knTrigramLogProb(s, d),
      Some("""
        WITH docs AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
          FROM documents WHERE text IS NOT NULL),
        tris AS (
          SELECT doc_id,
            ts[i] AS w1, ts[i + 1] AS w2, ts[i + 2] AS w3
          FROM docs, unnest(generate_series(1, len(ts) - 2)) AS g(i)),
        c3t AS (
          SELECT w1, w2, w3, count(*) AS c3 FROM tris GROUP BY 1, 2, 3),
        ctx3 AS (
          SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS c2, count(*) AS b3
          FROM c3t GROUP BY 1, 2),
        n3t AS (
          SELECT w2, w3, count(*) AS n3 FROM c3t GROUP BY 1, 2),
        mid AS (
          SELECT w2, CAST(sum(n3) AS BIGINT) AS n3mid, count(*) AS b2
          FROM n3t GROUP BY 1),
        bgt AS (
          SELECT DISTINCT ts[i] AS bw1, ts[i + 1] AS bw2
          FROM docs, unnest(generate_series(1, len(ts) - 1)) AS g(i)),
        n2t AS (SELECT bw2 AS w3, count(*) AS n2 FROM bgt GROUP BY 1),
        nbg AS (SELECT count(*) AS n_bg_types FROM bgt)
        SELECT doc_id, count(*) AS n_trigrams,
          round(sum(ln(
            (greatest(CAST(c3 AS DOUBLE) - 0.75, 0.0) +
             0.75 * b3 * (
               (greatest(CAST(n3 AS DOUBLE) - 0.75, 0.0) +
                0.75 * b2 * (CAST(n2 AS DOUBLE) / n_bg_types)) / n3mid))
            / c2)) / count(*), 9) AS avg_kn_logprob
        FROM tris
        JOIN c3t USING (w1, w2, w3)
        JOIN ctx3 USING (w1, w2)
        JOIN n3t USING (w2, w3)
        JOIN mid USING (w2)
        JOIN n2t USING (w3), nbg
        GROUP BY doc_id
        ORDER BY doc_id""")),
    Op("q_text_logprob_bi", (s, d) => bigramLogProb(s, d),
      Some("""
        WITH docs AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
          FROM documents WHERE text IS NOT NULL),
        toks AS (SELECT doc_id, unnest(ts) AS t FROM docs),
        unifreq AS (SELECT t, count(*) AS c1 FROM toks GROUP BY t),
        tot AS (SELECT count(*) AS n_total FROM toks),
        bis AS (
          SELECT doc_id, unnest(list_transform(
            generate_series(1, len(ts) - 1),
            i -> ts[i] || ' ' || ts[i + 1])) AS bg
          FROM docs),
        bifreq AS (SELECT bg, count(*) AS c2 FROM bis GROUP BY bg),
        ctxfreq AS (
          SELECT split_part(bg, ' ', 1) AS ctx, CAST(sum(c2) AS BIGINT) AS c1ctx
          FROM bifreq GROUP BY 1)
        SELECT doc_id, count(*) AS n_bigrams,
               round(sum(ln(0.7 * (CAST(c2 AS DOUBLE) / CAST(c1ctx AS DOUBLE)) +
                            0.3 * (CAST(c1 AS DOUBLE) / CAST(n_total AS DOUBLE))))
                 / count(*), 9) AS avg_bi_logprob
        FROM bis
        JOIN bifreq USING (bg)
        JOIN ctxfreq ON split_part(bg, ' ', 1) = ctx
        JOIN unifreq ON split_part(bg, ' ', 2) = t, tot
        GROUP BY doc_id
        ORDER BY doc_id""")),
    Op("q_text_df", (s, d) => docFrequency(s, d),
      Some("""
        WITH toks AS (
          SELECT DISTINCT doc_id,
            unnest(string_split_regex(trim(text), '\s+')) AS token
          FROM documents WHERE text IS NOT NULL),
        tot AS (
          SELECT count(*) AS n_docs FROM documents WHERE text IS NOT NULL),
        dfreq AS (
          SELECT token, count(*) AS df FROM toks GROUP BY token)
        SELECT token, df, ln((n_docs + 1.0) / (df + 1.0)) AS idf
        FROM dfreq, tot
        WHERE df >= 5
        ORDER BY df DESC, token
        LIMIT 200""")),
    Op("q_text_dedup_words", dedupWords,
      Some("""
        WITH w AS (
          SELECT doc_id,
            unnest(string_split_regex(trim(text), '\s+')) AS w,
            unnest(range(0, len(string_split_regex(trim(text), '\s+')))) AS pos
          FROM documents),
        firsts AS (
          SELECT doc_id, w, pos,
            row_number() OVER (PARTITION BY doc_id, w ORDER BY pos) AS rn
          FROM w)
        SELECT doc_id, count(*) AS n_unique,
          string_agg(w, ' ' ORDER BY pos) AS deduped
        FROM firsts WHERE rn = 1
        GROUP BY doc_id ORDER BY doc_id""")),
    Op("q_text_repetition", repetitionStats,
      Some("""
        WITH w AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
        bg AS (
          SELECT doc_id, unnest(list_transform(range(0, len(ws) - 1),
              i -> ws[i+1] || ' ' || ws[i+2])) AS bg
          FROM w WHERE len(ws) >= 2),
        top AS (
          SELECT doc_id, CAST(max(c) AS BIGINT) AS tbc, CAST(sum(c) AS BIGINT) AS nbg
          FROM (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg)
          GROUP BY doc_id)
        SELECT w.doc_id,
          CAST(len(ws) AS BIGINT) AS n_words,
          CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
          coalesce(t.tbc, 0) AS top_bigram_count,
          coalesce(t.nbg, 0) AS n_bigrams,
          ((CAST(len(ws) AS BIGINT) - CAST(len(list_distinct(ws)) AS BIGINT)) * 10
              > CAST(len(ws) AS BIGINT) * 3
            OR coalesce(t.tbc, 0) * 10 > coalesce(t.nbg, 0)) AS flagged
        FROM w LEFT JOIN top t USING (doc_id)
        ORDER BY w.doc_id""")),
    Op("q_text_tokens", tokenCounts,
      Some("""
        SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_ws_tokens,
          CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_tokens
        FROM documents ORDER BY doc_id""")),
    Op("q_text_quality", qualityScore,
      Some("""
        SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
          CAST(length(text) AS DOUBLE) / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS avg_token_len,
          CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS punct_ratio,
          CAST(len(list_filter(string_split_regex(trim(text), '\s+'), t -> t IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
            / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS stopword_ratio
        FROM documents ORDER BY doc_id""")),
    // The heuristic is deterministic per-row arithmetic, so it IS
    // SQL-expressible: same stopword lists, same CJK char count, same
    // tie-break order (und; then alphabetical among winners; zh last).
    Op("q_text_langid", langId,
      Some("""
        WITH counts AS (
          SELECT doc_id,
            len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
              t -> t IN ('the','a','of','and','to','in','is','that','it','for'))) AS s_en,
            len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
              t -> t IN ('der','die','das','und','ist','nicht','ein','mit','auf','zu'))) AS s_de,
            len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
              t -> t IN ('le','la','les','et','est','un','une','dans','pour','que'))) AS s_fr,
            len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
              t -> t IN ('el','la','los','las','y','es','un','una','por','para'))) AS s_es,
            len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS s_zh
          FROM documents)
        SELECT doc_id,
          CASE WHEN best = 0 THEN 'und'
               WHEN s_de = best THEN 'de'
               WHEN s_en = best THEN 'en'
               WHEN s_es = best THEN 'es'
               WHEN s_fr = best THEN 'fr'
               ELSE 'zh' END AS lang_pred,
          CAST(best AS BIGINT) AS lang_score
        FROM (SELECT *, greatest(s_en, s_de, s_fr, s_es, s_zh) AS best FROM counts)
        ORDER BY doc_id""")),
    Op("q_text_fingerprint", fingerprint,
      Some("""
        SELECT doc_id,
          list_reduce(
            list_prepend(CAST(0 AS BIGINT),
                         [CAST(ascii(c) AS BIGINT) for c in string_split(text, '')]),
            (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
        FROM documents ORDER BY doc_id"""))
  )
}
