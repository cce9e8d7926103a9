package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Op
import graft.functions.{GraftFunctions, VectorExpressions}
import graft.sources.Tables

/** Similarity search over the `embeddings` table (`Array[Float]` column):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path.
  *
  * Vector math runs through graft's native codegen'd expressions
  * (`graft_cosine`, `graft_hyperplane_sig` — see
  * [[graft.functions.VectorExpressions]]): one fused Java loop per row
  * inside whole-stage codegen. Construction per Charikar (2002) random
  * hyperplane LSH; multi-probe via banding the bit signature.
  *
  * Scale design: the query set is small and BROADCAST; the corpus is
  * scanned once, signatures are per-row (no shuffle). Brute force ranks
  * (query × corpus) with one shuffle on query_id. The LSH path replaces
  * the full cross product with bucket joins: O(n·bands) candidate rows.
  */
object Similarity {

  /** Σ aᵢ·bᵢ — interpreted HOF helper for small-frame spot checks; use
    * [[GraftFunctions.cosine]] on hot paths.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Cast float vector to double and L2-normalize (zero vectors pass
    * through as zeros so cosine with them is 0, never NaN). Interpreted;
    * operators use raw vectors + `graft_cosine` instead.
    */
  def normalized(v: Column): Column = {
    val d = transform(v, x => x.cast("double"))
    val n = sqrt(aggregate(d, lit(0.0d), (acc, x) => acc + x * x))
    when(n === 0.0d, d).otherwise(transform(d, x => x / n))
  }

  val NumPlanes: Int = GraftFunctions.DefaultPlanes
  val PlaneBandBits = 4
  val NumPlaneBands: Int = NumPlanes / PlaneBandBits

  /** (vec_id, v raw, sig): per-row hyperplane signature over the raw
    * vector (sign is scale-invariant — no normalization needed).
    */
  private[operators] def signedCorpus(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").as("v"),
      GraftFunctions.hyperplaneSig(col("embedding")).as("sig"))

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("embedding").as("v"))

  /** Exact top-k: broadcast the query set, one pass over the corpus,
    * rank per query by (cosine desc, vec_id) — deterministic tiebreak.
    */
  def bruteForceTopK(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 5): DataFrame = {
    val c = corpus(spark, dir)
    // Query side reads its own pruned scan (PushedFilters: vec_id < n) —
    // building the broadcast from `c` would re-execute the corpus-wide
    // spread shuffle just to keep 5 rows.
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      // project vectors away BEFORE the ranking shuffle: the window keys
      // on (query_id, cos, vec_id) — 24B rows instead of 2×512B vectors
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine(col("v"), col("qv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** (id, payload, band_id, bucket) rows: one per signature band. The
    * band hashes are an EXPLICIT array of per-band expressions (not a
    * lambda over `sequence`) so `sig` stays multiply-referenced and
    * CollapseProject cannot inline its computation into a per-band
    * re-evaluation.
    */
  private[operators] def bandedBuckets(df: DataFrame, idCol: String, vCol: String): DataFrame = {
    val bucketCols = (0 until NumPlaneBands).map { b =>
      xxhash64(lit(b), call_function("shiftright", col("sig"), lit(b * PlaneBandBits))
        .bitwiseAND(lit((1L << PlaneBandBits) - 1)))
    }
    df.select(col(idCol), col(vCol), posexplode(array(bucketCols: _*)))
      .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "bucket")
  }

  /** LSH-bucketed ANN: candidates share ≥1 signature band with the query
    * (multi-probe across 4 bands of 4 bits); exact cosine re-ranks the
    * candidates. Recall vs brute force is the spec's metric.
    */
  def lshTopK(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 5): DataFrame = {
    val c = signedCorpus(Tables.spread(Tables.embeddings(spark, dir)))
    // Query signatures from a pruned scan (see bruteForceTopK): 5 rows
    // never justify re-running the corpus spread shuffle.
    val qb = bandedBuckets(
      signedCorpus(Tables.embeddings(spark, dir).filter(col("vec_id") < nQueries))
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("sig")),
      "query_id", "qv")
    val cb = bandedBuckets(c, "vec_id", "v")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    cb.join(broadcast(qb),
        qb("band_id") === cb("band_id") && qb("bucket") === cb("bucket") &&
          col("vec_id") =!= col("query_id"))
      // score BEFORE the pair-dedup: cosine is deterministic per pair, so
      // distinct on (query_id, vec_id, cos) is exact — and the dedup +
      // ranking shuffles carry 24B rows, not two 512B vectors
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine(col("v"), col("qv")).as("cos"))
      .distinct() // a pair can share several bands
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-style ANN: a coarse quantizer (k-means centroids trained on a
    * BOUNDED driver-side sample — O(sample·k·iters) regardless of corpus
    * size) partitions the corpus into nLists inverted lists; each query
    * probes its nProbe nearest lists and re-ranks candidates by exact
    * cosine. Unlike the hash-based LSH path, the probe fraction is an
    * explicit knob (~nProbe/nLists of the corpus), which is the operating
    * control a 100 TB ANN deployment actually tunes.
    *
    * Scale shape: list assignment is one codegen'd pass (no shuffle);
    * candidate generation is a broadcast join on list_id; one shuffle on
    * query_id for the ranking window.
    */
  /** Deterministic coarse-quantizer training: the sample is ordered by
    * vec_id before limit (a bare limit is partition-layout dependent,
    * and the trained centroids — hence list assignment — must be
    * identical on every run), then Lloyd-trained on the driver.
    */
  private def trainedKernel(spark: SparkSession, dir: String,
      nLists: Int, sampleSize: Int): graft.functions.CentroidKernel = {
    val sample = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(sampleSize)
      .collect().map(_.getSeq[Float](1).toArray)
    graft.functions.CentroidKernel.train(
      sample, nLists, VectorExpressions.Dim)
  }

  /** Per-dimension affine quantization table `(mins, scales)`: ONE
    * single-pass fixed-buffer aggregate ([[graft.functions.VecMinMaxAgg]],
    * ~0.5 KB per partition). The previous posexplode+groupBy shape
    * shuffled one row per (vector, dimension) — n·dim rows, a
    * corpus-sized shuffle at 100 TB — and ran as 2-3 AQE jobs where
    * this is one. Values are bit-identical (same float total order).
    */
  private def affineTable(emb: DataFrame): (Array[Float], Array[Float]) = {
    import org.apache.spark.sql.GraftShim
    val dim = VectorExpressions.Dim
    val buf = emb
      .agg(GraftShim.column(graft.functions.VecMinMaxAgg(
        GraftShim.expression(col("embedding")), dim)
        .toAggregateExpression()).as("mm"))
      .collect()(0).getSeq[Float](0).toArray
    val mins = new Array[Float](dim)
    val scales = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      // dims no vector reached keep the old route's (0, 0) affine row
      // (its sparse collect simply never wrote them)
      if (buf(i) != Float.PositiveInfinity) {
        mins(i) = buf(i)
        scales(i) = (buf(dim + i) - mins(i)) / 255f
      }
      i += 1
    }
    (mins, scales)
  }

  /** Exact-cosine re-rank of a `(query_id, vec_id)` shortlist against
    * raw vectors. Both joined sides broadcast (the shortlist is
    * ~k·factor·nQueries rows, `queries` is `(query_id, qv)` and tiny),
    * so raw vectors are touched shortlist-only.
    */
  private def exactRerank(emb: DataFrame, short: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    emb.select(col("vec_id"), col("embedding").as("v"))
      .join(broadcast(short), "vec_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine(col("v"), col("qv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  def ivfTopK(
      spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 5,
      nLists: Int = 16, nProbe: Int = 4, sampleSize: Int = 4096): DataFrame = {
    val emb = Tables.spread(Tables.embeddings(spark, dir))
    val kernel = trainedKernel(spark, dir, nLists, sampleSize)
    def lists(v: Column, p: Int): Column = GraftFunctions.nearestCentroids(v, kernel, p)

    val c = emb.select(col("vec_id"), col("embedding").as("v"),
      element_at(lists(col("embedding"), 1), 1).as("list_id"))
    // Probe lists from a pruned scan (see bruteForceTopK): the broadcast
    // build must not re-run the corpus spread shuffle for 5 rows.
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        explode(lists(col("embedding"), nProbe)).as("list_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    c.join(broadcast(q),
        q("list_id") === c("list_id") && col("vec_id") =!= col("query_id"))
      // vectors projected away before the ranking shuffle (see lshTopK)
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine(col("v"), col("qv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** int8-quantized ANN — the memory-footprint scale path (IVF's
    * complement): the corpus compresses 4× into per-dimension affine
    * byte codes ([[graft.functions.QuantizeVec]]; the affine table is
    * one corpus min/max aggregate whose shuffle carries `dim` rows),
    * the candidate scan ranks every code by ASYMMETRIC cosine
    * (full-precision query × reconstructed code, codegen'd
    * [[graft.functions.QuantizedCosine]]) touching only the 64-byte
    * codes, and exact cosine re-ranks the `k·shortlistFactor`
    * shortlist against raw vectors. At 100 TB the code scan reads a
    * quarter of the bytes and the raw vectors are touched only for
    * ~k·factor rows per query; composes with the IVF list pruning for
    * the full IVF-PQ-style shape.
    */
  def quantizedTopK(spark: SparkSession, dir: String, k: Int = 10,
      nQueries: Int = 5, shortlistFactor: Int = 4): DataFrame = {
    import org.apache.spark.sql.GraftShim
    val emb = Tables.spread(Tables.embeddings(spark, dir))
    val (mins, scales) = affineTable(emb)
    val codes = emb.select(col("vec_id"),
      GraftShim.column(graft.functions.QuantizeVec(
        GraftShim.expression(col("embedding")), mins, scales)).as("code"))
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wA = Window.partitionBy(col("query_id")).orderBy(col("acos").desc, col("vec_id"))
    val short = codes.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        GraftShim.column(graft.functions.QuantizedCosine(
          GraftShim.expression(col("code")), GraftShim.expression(col("qv")),
          mins, scales)).as("acos"))
      .withColumn("r", row_number().over(wA))
      .filter(col("r") <= k * shortlistFactor)
      .select(col("query_id"), col("vec_id"))
    exactRerank(emb, short, q, k)
  }

  /** Driver-checkable recall audit: does the approximate top-k cover, on
    * average over the query set, ≥ `floor` of the exact top-k? Both
    * pipelines run in ONE plan (the exact side doubles as ground truth),
    * the comparison is a slim (query_id, vec_id) semi-join, and the
    * output carries no approximate values — so the DuckDB oracle can pin
    * it: `n_queries` is recomputed from the table and
    * `mean_recall_ok=true` is the contract the floor enforces. A recall
    * regression in either ANN path flips the boolean and fails the hash
    * gate. Mean (not per-query) because single-query recall on random
    * gaussian corpora sits as low as 0.1 — a per-query floor would have
    * zero margin; the mean is stable (measured 0.24–0.52 across scales).
    */
  private def recallAudit(exact: DataFrame, ann: DataFrame, floor: Double): DataFrame = {
    val truth = exact.select(col("query_id"), col("vec_id"))
    val hits = truth
      .join(ann.select(col("query_id"), col("vec_id")), Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    truth.groupBy(col("query_id")).agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_true").cast("double")).as("recall"))
      .agg(
        count(lit(1)).as("n_queries"),
        (avg(col("recall")) >= lit(floor)).as("mean_recall_ok"))
  }

  private val RecallAuditOracle = """
    SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS mean_recall_ok
    FROM embeddings WHERE vec_id < 5"""

  def lshRecallAudit(spark: SparkSession, dir: String,
      k: Int = 10, nQueries: Int = 5, floor: Double = 0.15): DataFrame =
    recallAudit(
      bruteForceTopK(spark, dir, k, nQueries),
      lshTopK(spark, dir, k, nQueries), floor)

  def ivfRecallAudit(spark: SparkSession, dir: String,
      k: Int = 10, nQueries: Int = 5, floor: Double = 0.3): DataFrame =
    recallAudit(
      bruteForceTopK(spark, dir, k, nQueries),
      ivfTopK(spark, dir, k, nQueries), floor)

  /** The composed IVF-PQ-style shape: IVF list pruning bounds WHICH
    * rows are scanned (~nProbe/nLists of the corpus), int8 codes bound
    * how many BYTES each scanned row costs (4×), and exact cosine
    * re-ranks the shortlist against raw vectors. This is the full
    * 100 TB ANN deployment shape; the components are the ones proven
    * individually by `q_sim_ivf` / `q_sim_quantized`, composed without
    * modification (spec pins the recall floor).
    */
  def ivfQuantizedTopK(
      spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 5,
      nLists: Int = 16, nProbe: Int = 4, sampleSize: Int = 4096,
      shortlistFactor: Int = 4): DataFrame = {
    import org.apache.spark.sql.GraftShim
    val emb = Tables.spread(Tables.embeddings(spark, dir))
    val kernel = trainedKernel(spark, dir, nLists, sampleSize)
    def lists(v: Column, p: Int): Column = GraftFunctions.nearestCentroids(v, kernel, p)
    val (mins, scales) = affineTable(emb)
    // the persisted index shape: (vec_id, list_id, 64-byte code) — raw
    // vectors appear nowhere in the candidate scan
    val index = emb.select(col("vec_id"),
      element_at(lists(col("embedding"), 1), 1).as("list_id"),
      GraftShim.column(graft.functions.QuantizeVec(
        GraftShim.expression(col("embedding")), mins, scales)).as("code"))
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        explode(lists(col("embedding"), nProbe)).as("list_id"))
    val wA = Window.partitionBy(col("query_id")).orderBy(col("acos").desc, col("vec_id"))
    val short = index.join(broadcast(q),
        q("list_id") === index("list_id") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        GraftShim.column(graft.functions.QuantizedCosine(
          GraftShim.expression(col("code")), GraftShim.expression(col("qv")),
          mins, scales)).as("acos"))
      .withColumn("r", row_number().over(wA))
      .filter(col("r") <= k * shortlistFactor)
      .select(col("query_id"), col("vec_id"))
    val qv = Tables.embeddings(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    exactRerank(emb, short, qv, k)
  }

  /** int8 reconstruction error is tiny relative to gaussian-corpus
    * cosine gaps, so the quantized path's recall floor sits far above
    * the hash/centroid paths' (measured ≥ 0.9 across scales; floored
    * at 0.6 for margin).
    */
  def quantizedRecallAudit(spark: SparkSession, dir: String,
      k: Int = 10, nQueries: Int = 5, floor: Double = 0.6): DataFrame =
    recallAudit(
      bruteForceTopK(spark, dir, k, nQueries),
      quantizedTopK(spark, dir, k, nQueries), floor)

  /** PCA-reduced ANN — the dimensionality-reduction scale path: the
    * fit is ONE distributed moments aggregation (fixed ~17 KB buffer
    * per task, [[graft.functions.VecMomentsAgg]]), the 64×64
    * eigensolve runs on the driver in microseconds, and the corpus
    * scans 4× fewer floats (nComponents/dim) during candidate ranking;
    * exact cosine re-ranks the k·factor shortlist against raw vectors.
    * Composes with the IVF/int8 routes (project-then-index is the
    * standard 100 TB recipe); recall floor pinned by the same anchored
    * audit as the other ANN paths.
    */
  def pcaTopK(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 5,
      nComponents: Int = 16, shortlistFactor: Int = 4): DataFrame = {
    import org.apache.spark.sql.GraftShim
    val emb = Tables.spread(Tables.embeddings(spark, dir))
    val dim = VectorExpressions.Dim
    val buf = Tables.embeddings(spark, dir)
      .agg(GraftShim.column(graft.functions.VecMomentsAgg(
        GraftShim.expression(col("embedding")), dim)
        .toAggregateExpression()).as("m"))
      .collect()(0).getSeq[Double](0).toArray
    val model = graft.functions.Pca.fit(buf, dim, nComponents)
    def proj(c: Column): Column = GraftShim.column(graft.functions.ProjectVec(
      GraftShim.expression(c), model.mean, model.components))
    val reduced = emb.select(col("vec_id"), proj(col("embedding")).as("rv"))
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), proj(col("embedding")).as("qrv"))
    val wA = Window.partitionBy(col("query_id")).orderBy(col("rcos").desc, col("vec_id"))
    val short = reduced.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosine(col("rv"), col("qrv")).as("rcos"))
      .withColumn("r", row_number().over(wA))
      .filter(col("r") <= k * shortlistFactor)
      .select(col("query_id"), col("vec_id"))
    val qv = Tables.embeddings(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    exactRerank(emb, short, qv, k)
  }

  /** Gaussian-synthetic embeddings spread variance evenly, the WORST
    * case for PCA (no dominant directions), so the floor sits at the
    * conservative 0.3 the other coarse routes use; real embedding
    * corpora concentrate variance and do far better.
    */
  def pcaRecallAudit(spark: SparkSession, dir: String,
      k: Int = 10, nQueries: Int = 5, floor: Double = 0.3): DataFrame =
    recallAudit(
      bruteForceTopK(spark, dir, k, nQueries),
      pcaTopK(spark, dir, k, nQueries), floor)

  /** IVF pruning composed with int8 codes loses no recall vs plain IVF
    * on this corpus (FunctionsSpec pins ≥); floored at IVF's own 0.3.
    */
  def ivfQuantizedRecallAudit(spark: SparkSession, dir: String,
      k: Int = 10, nQueries: Int = 5, floor: Double = 0.3): DataFrame =
    recallAudit(
      bruteForceTopK(spark, dir, k, nQueries),
      ivfQuantizedTopK(spark, dir, k, nQueries), floor)

  /** Product-quantized ANN — the extreme-compression scale path: the
    * corpus compresses dim·4/m × (32× at m=8 on 64-dim float32) into
    * m-byte codes via per-subspace codebooks
    * ([[graft.functions.PqKernel]], trained on the same deterministic
    * driver sample as the IVF quantizer), the candidate scan ranks
    * every code by codegen'd ADC cosine reading m BYTES per corpus row,
    * and exact cosine re-ranks the k·factor shortlist against raw
    * vectors. At 100 TB this is the only route whose index fits in
    * cluster RAM (100 TB of float32 → ~3 TB of codes); recall is
    * coarser than int8's, recovered by the wider shortlist.
    */
  def pqTopK(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 5,
      m: Int = 8, ks: Int = 32, sampleSize: Int = 4096,
      shortlistFactor: Int = 8): DataFrame = {
    import org.apache.spark.sql.GraftShim
    val emb = Tables.spread(Tables.embeddings(spark, dir))
    val sample = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(sampleSize)
      .collect().map(_.getSeq[Float](1).toArray)
    val kernel = graft.functions.PqKernel.train(
      sample, VectorExpressions.Dim, m, ks)
    val codes = emb.select(col("vec_id"),
      GraftShim.column(graft.functions.PqEncode(
        GraftShim.expression(col("embedding")), kernel)).as("code"))
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wA = Window.partitionBy(col("query_id")).orderBy(col("acos").desc, col("vec_id"))
    val short = codes.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        GraftShim.column(graft.functions.PqCosine(
          GraftShim.expression(col("code")), GraftShim.expression(col("qv")),
          kernel)).as("acos"))
      .withColumn("r", row_number().over(wA))
      .filter(col("r") <= k * shortlistFactor)
      .select(col("query_id"), col("vec_id"))
    exactRerank(emb, short, q, k)
  }

  /** m-byte codes are the coarsest route here; the wide shortlist
    * (8×k) pulls mean recall back to the coarse-route floor.
    */
  def pqRecallAudit(spark: SparkSession, dir: String,
      k: Int = 10, nQueries: Int = 5, floor: Double = 0.3): DataFrame =
    recallAudit(
      bruteForceTopK(spark, dir, k, nQueries),
      pqTopK(spark, dir, k, nQueries), floor)

  val ops: Seq[Op] = Seq(
    Op("q_sim_pq", (s, d) => pqRecallAudit(s, d),
      Some(RecallAuditOracle)),
    Op("q_sim_quantized", (s, d) => quantizedRecallAudit(s, d),
      Some(RecallAuditOracle)),
    Op("q_sim_ivfpq", (s, d) => ivfQuantizedRecallAudit(s, d),
      Some(RecallAuditOracle)),
    Op("q_sim_pca", (s, d) => pcaRecallAudit(s, d),
      Some(RecallAuditOracle)),
    Op("q_sim_ivf", (s, d) => ivfRecallAudit(s, d), Some(RecallAuditOracle)),
    Op("q_sim_topk", (s, d) => bruteForceTopK(s, d),
      Some("""
        SELECT query_id, rank, vec_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
            CAST(ROW_NUMBER() OVER (
              PARTITION BY q.vec_id
              ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS INT) AS rank
          FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id <> q.vec_id) t
        WHERE rank <= 10
        ORDER BY query_id, rank""")),
    Op("q_sim_lsh", (s, d) => lshRecallAudit(s, d), Some(RecallAuditOracle))
  )
}
