package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** IVF coarse quantizer: fixed centroid matrix + nearest-list lookup,
  * shared between the expression (below) and driver-side training.
  *
  * Vectors are L2-normalized before the distance computation so that
  * nearest-by-L2 ordering matches cosine ordering (the re-rank metric);
  * centroids are trained on normalized samples for the same reason.
  */
final class CentroidKernel(val centroids: Array[Double], val dim: Int)
    extends Serializable {
  require(centroids.length % dim == 0, "centroid matrix shape mismatch")
  val nLists: Int = centroids.length / dim


  /** Squared L2 distance (normalized input) to the nearest centroid —
    * the per-row inertia contribution of a Lloyd iteration.
    */
  def nearestDist(v: ArrayData, elemFloat: Boolean): Double = {
    val n = math.min(v.numElements(), dim)
    var norm = 0.0
    var j = 0
    while (j < n) {
      val x = if (v.isNullAt(j)) 0.0 else if (elemFloat) v.getFloat(j).toDouble else v.getDouble(j)
      norm += x * x; j += 1
    }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    var best = Double.MaxValue
    var c = 0
    while (c < nLists) {
      var d = 0.0
      var k = 0
      val base = c * dim
      while (k < n) {
        val x = (if (v.isNullAt(k)) 0.0 else if (elemFloat) v.getFloat(k).toDouble else v.getDouble(k)) * inv
        val diff = x - centroids(base + k)
        d += diff * diff; k += 1
      }
      if (d < best) best = d
      c += 1
    }
    best
  }

  /** Indices of the `nProbe` nearest centroids (ascending distance,
    * deterministic index tiebreak), as an int array.
    */
  def nearest(v: ArrayData, elemFloat: Boolean, nProbe: Int): ArrayData = {
    val n = math.min(v.numElements(), dim)
    // normalize input
    var norm = 0.0
    var j = 0
    while (j < n) {
      val x = if (v.isNullAt(j)) 0.0 else if (elemFloat) v.getFloat(j).toDouble else v.getDouble(j)
      norm += x * x; j += 1
    }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val p = math.min(nProbe, nLists)
    val bestIdx = new Array[Int](p)
    val bestDist = Array.fill(p)(Double.MaxValue)
    var c = 0
    while (c < nLists) {
      var d = 0.0
      var k = 0
      val base = c * dim
      while (k < n) {
        val x = (if (v.isNullAt(k)) 0.0 else if (elemFloat) v.getFloat(k).toDouble else v.getDouble(k)) * inv
        val diff = x - centroids(base + k)
        d += diff * diff; k += 1
      }
      // insertion into the small top-p buffer
      if (d < bestDist(p - 1)) {
        var i = p - 1
        while (i > 0 && bestDist(i - 1) > d) {
          bestDist(i) = bestDist(i - 1); bestIdx(i) = bestIdx(i - 1); i -= 1
        }
        bestDist(i) = d; bestIdx(i) = c
      }
      c += 1
    }
    new GenericArrayData(bestIdx)
  }
}

object CentroidKernel {

  /** Deterministic Lloyd's k-means on a driver-side sample of normalized
    * vectors: init = first k distinct points, fixed iteration count.
    * The sample is bounded (caller passes ≤ a few thousand rows), so this
    * is O(sample × k × iters) driver work — independent of corpus size.
    */
  def train(sample: Array[Array[Float]], k: Int, dim: Int, iters: Int = 10): CentroidKernel = {
    val pts = sample.map { v =>
      val d = new Array[Double](dim)
      val n = math.min(v.length, dim)
      var norm = 0.0
      for (j <- 0 until n) norm += v(j).toDouble * v(j)
      val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
      for (j <- 0 until n) d(j) = v(j) * inv
      d
    }
    require(pts.nonEmpty, "empty centroid training sample")
    val cents = Array.tabulate(k)(i => pts(i % pts.length).clone())
    // while-form inner loops: same arithmetic in the same order as the
    // Range.foreach spelling (bit-identical centroids), minus the
    // closure-per-element overhead this 40M-op driver fit was paying on
    // every IVF invocation.
    val n = pts.length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      var i = 0
      while (i < n) {
        val p = pts(i)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val cc = cents(c)
          var d = 0.0
          var j = 0
          while (j < dim) { val t = p(j) - cc(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        val sb = sums(best)
        var j = 0
        while (j < dim) { sb(j) += p(j); j += 1 }
        i += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { cents(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
      it += 1
    }
    new CentroidKernel(cents.flatten, dim)
  }
}

/** `nearest_centroids(v)` → array<int> of the kernel's nProbe nearest
  * coarse-quantizer lists for the vector. Codegen emits one virtual call
  * into the JIT-compiled kernel loop.
  */
case class NearestCentroids(child: Expression, kernel: CentroidKernel, nProbe: Int)
    extends UnaryExpression {
  import VectorExpressions._

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    checkVector(child.dataType, prettyName)
  override def prettyName: String = "graft_nearest_centroids"

  private lazy val elemFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    kernel.nearest(input.asInstanceOf[ArrayData], elemFloat, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val k = ctx.addReferenceObj("centroidKernel", kernel,
        "graft.functions.CentroidKernel")
      s"${ev.value} = $k.nearest($arr, $elemFloat, $nProbe);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** `nearest_centroid_dist(v)` → double: squared L2 distance of the
  * normalized vector to its nearest coarse-quantizer centroid — the
  * per-row inertia term of a distributed Lloyd iteration, codegen'd
  * like [[NearestCentroids]].
  */
case class NearestCentroidDist(child: Expression, kernel: CentroidKernel)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkVector(child.dataType, prettyName)
  override def prettyName: String = "graft_nearest_centroid_dist"

  private lazy val elemFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def eval0(arr: ArrayData): Double = kernel.nearestDist(arr, elemFloat)

  override protected def nullSafeEval(input: Any): Any =
    eval0(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("centroidDist", this,
        classOf[NearestCentroidDist].getName)
      s"${ev.value} = $ref.eval0($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidDist =
    copy(child = newChild)
}
