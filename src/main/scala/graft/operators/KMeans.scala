package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.functions._

import graft.Op
import graft.functions.{CentroidKernel, GraftFunctions, L2Normalize, NearestCentroidDist, VecMomentsAgg, VectorExpressions}
import graft.sources.Tables

/** Distributed Lloyd's k-means over the embedding corpus — the
  * full-data refinement of the driver-sample training that seeds the
  * IVF coarse quantizer (`CentroidKernel.train`, the reference pattern
  * for bounded-sample model fitting). Each iteration is ONE pass over
  * the corpus: assignment and the per-row inertia term are codegen'd
  * kernels ([[graft.functions.NearestCentroids]] /
  * [[graft.functions.NearestCentroidDist]]), the centroid update is a
  * k-group aggregation of [[graft.functions.L2Normalize]]d vectors
  * (the shuffle carries k moment buffers per partition, never rows),
  * and only the k×dim centroid matrix ever lands on the driver. The
  * big-data/small-model split of [[graft.functions.Pca]], iterated.
  *
  * Lloyd's guarantee — inertia non-increasing per iteration — is the
  * audit contract: [[kmeansAudit]] emits it as in-plan booleans a
  * driver oracle can hash (tolerance 1e-6 relative, for fp sum-order
  * drift at convergence).
  */
object KMeans {

  final case class Result(kernel: CentroidKernel, inertia: Seq[Double])

  /** `iters` Lloyd passes starting from a deterministic driver-sample
    * seed. Empty clusters keep their previous centroid (the standard
    * convention). Returns the refined kernel plus the inertia measured
    * at the START of each iteration (assignment against that
    * iteration's centroids).
    */
  def refine(spark: SparkSession, dir: String, nLists: Int = 16,
      iters: Int = 4, sampleSize: Int = 4096): Result = {
    val dim = VectorExpressions.Dim
    val seed = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(sampleSize)
      .collect().map(_.getSeq[Float](1).toArray)
    var kernel = CentroidKernel.train(seed, nLists, dim)
    val emb = Tables.spread(Tables.embeddings(spark, dir))
    val inertias = Seq.newBuilder[Double]
    for (_ <- 0 until iters) {
      def ex(c: Column) = GraftShim.expression(c)
      val assigned = emb.select(
        element_at(GraftFunctions.nearestCentroids(col("embedding"), kernel, 1), 1)
          .as("list_id"),
        GraftShim.column(NearestCentroidDist(ex(col("embedding")), kernel)).as("d2"),
        GraftShim.column(L2Normalize(ex(col("embedding")))).as("nv"))
      val rows = assigned.groupBy(col("list_id")).agg(
        GraftShim.column(VecMomentsAgg(ex(col("nv")), dim)
          .toAggregateExpression()).as("m"),
        sum(col("d2")).as("inertia")).collect()
      inertias += rows.map(_.getDouble(2)).sum
      val next = kernel.centroids.clone()
      rows.foreach { r =>
        val list = r.getInt(0)
        val m = r.getSeq[Double](1)
        val n = m(0)
        if (n > 0) {
          var j = 0
          while (j < dim) { next(list * dim + j) = m(1 + j) / n; j += 1 }
        }
      }
      kernel = new CentroidKernel(next, dim)
    }
    Result(kernel, inertias.result())
  }

  /** The driver-graded shape: per-iteration inertia reduced to the
    * booleans Lloyd's guarantees — monotone non-increasing and final ≤
    * first — plus the iteration count. DuckDB cannot run k-means; what
    * it CAN check is that the engine asserted the mathematical contract
    * and produced the agreed number of iterations.
    */
  def kmeansAudit(spark: SparkSession, dir: String, nLists: Int = 16,
      iters: Int = 4): DataFrame = {
    val r = refine(spark, dir, nLists, iters)
    val inertia = r.inertia
    val monotone = inertia.sliding(2).forall {
      case Seq(a, b) => b <= a * (1.0 + 1e-6)
      case _ => true
    }
    import spark.implicits._
    Seq((iters.toLong, monotone, inertia.last <= inertia.head * (1.0 + 1e-6),
      r.kernel.nLists.toLong))
      .toDF("n_iters", "monotone_ok", "improved_ok", "n_lists")
  }

  val ops: Seq[Op] = Seq(
    Op("q_kmeans", (s, d) => kmeansAudit(s, d),
      Some("""
        SELECT CAST(4 AS BIGINT) AS n_iters, true AS monotone_ok,
               true AS improved_ok, CAST(16 AS BIGINT) AS n_lists""")))
}
