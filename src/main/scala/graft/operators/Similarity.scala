package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables

/** Similarity search over the `embeddings` table (`Array[Float]` column):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path.
  *
  * Vector math is `zip_with`/`aggregate` higher-order functions over the
  * array column — codegen'd, no UDFs. Construction per Charikar (2002)
  * random hyperplane LSH; multi-probe via banding the bit signature.
  *
  * Scale design: the query set is small and BROADCAST; the corpus is
  * scanned once. Brute force is one narrow pass producing (query × corpus)
  * partial top-k per partition (window row_number bounded by rank ≤ k
  * after a single shuffle on query_id). The LSH path replaces the full
  * cross product with bucket joins: O(n·bands) candidate rows.
  */
object Similarity {

  /** Σ aᵢ·bᵢ for two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Cast float vector to double and L2-normalize (zero vectors pass
    * through as zeros so cosine with them is 0, never NaN).
    */
  def normalized(v: Column): Column = {
    val d = transform(v, x => x.cast("double"))
    val n = sqrt(aggregate(d, lit(0.0d), (acc, x) => acc + x * x))
    when(n === 0.0d, d).otherwise(transform(d, x => x / n))
  }

  /** Fixed random hyperplanes (seeded) for the LSH signature. */
  val NumPlanes = 16
  val PlaneBandBits = 4
  val NumPlaneBands: Int = NumPlanes / PlaneBandBits
  private val Dim = 64
  private val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(NumPlanes)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  /** 16-bit signature: bit i = sign(v · planeᵢ). Per-row, no shuffle. */
  def hyperplaneSignature(v: Column): Column =
    aggregate(
      zip_with(
        typedlit(planes.map(_.toSeq).toSeq),
        sequence(lit(0), lit(NumPlanes - 1)),
        (plane, i) => when(dot(v, plane) >= 0.0d, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

  private def queries(vecs: DataFrame, nQueries: Int): DataFrame =
    vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.embeddings(spark, dir))
      .select(col("vec_id"), normalized(col("embedding")).as("v"))

  /** Exact top-k: broadcast the query set, one pass over the corpus,
    * rank per query by (cosine desc, vec_id) — deterministic tiebreak.
    */
  def bruteForceTopK(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 5): DataFrame = {
    val c = corpus(spark, dir)
    val q = queries(c, nQueries)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH-bucketed ANN: candidates share ≥1 signature band with the query
    * (multi-probe across 4 bands of 4 bits); exact cosine re-ranks the
    * candidates. Recall vs brute force is the spec's metric.
    */
  def lshTopK(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 5): DataFrame = {
    val c = corpus(spark, dir).withColumn("sig", hyperplaneSignature(col("v")))
    def banded(df: DataFrame, idCol: String, vCol: String): DataFrame =
      df.select(col(idCol), col(vCol), posexplode(
        transform(sequence(lit(0), lit(NumPlaneBands - 1)),
          b => xxhash64(b, call_function("shiftright", col("sig"), b * PlaneBandBits)
            .bitwiseAND(lit((1L << PlaneBandBits) - 1))))))
        .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "bucket")
    val qb = banded(
      c.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("sig")),
      "query_id", "qv")
    val cb = banded(c, "vec_id", "v")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    cb.join(broadcast(qb),
        qb("band_id") === cb("band_id") && qb("bucket") === cb("bucket") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("v"), col("qv"))
      .distinct() // a pair can share several bands
      .withColumn("cos", dot(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  val ops: Seq[Op] = Seq(
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
    Op("q_sim_lsh", (s, d) => lshTopK(s, d), None) // recall measured in spec
  )
}
