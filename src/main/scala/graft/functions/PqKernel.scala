package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product quantizer: the vector splits into `m` subspaces of `dim/m`
  * dimensions; each subspace has its own `ks`-centroid codebook, and a
  * vector encodes as `m` bytes (its nearest centroid per subspace) —
  * `dim·4 / m` bytes compression (32× at m=8, dim=64 float32). Scoring
  * is asymmetric (ADC): the full-precision query against the
  * reconstructed centroids, the standard PQ search arithmetic
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search").
  *
  * Vectors are L2-normalized BEFORE splitting (training and encoding
  * agree), so ADC ordering tracks cosine ordering — the re-rank metric.
  */
final class PqKernel(val codebooks: Array[Double], val dim: Int,
    val m: Int, val ks: Int) extends Serializable {
  require(m >= 1 && dim % m == 0, s"PqKernel: dim $dim not divisible by m $m")
  val subDim: Int = dim / m
  require(codebooks.length == m * ks * subDim, "PqKernel: codebook shape mismatch")
  require(ks <= 256, "PqKernel: one byte per subspace caps ks at 256")

  @inline private def cbBase(sub: Int, c: Int): Int = (sub * ks + c) * subDim

  /** Squared norms of every centroid, so the reconstructed-vector norm
    * is a table lookup at scoring time (subspaces are orthogonal
    * coordinate blocks: ‖recon‖² = Σ_sub ‖c_sub‖²).
    */
  private val cNorm2: Array[Double] = {
    val out = new Array[Double](m * ks)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ks) {
        var n2 = 0.0
        var j = 0
        val base = cbBase(s, c)
        while (j < subDim) { val x = codebooks(base + j); n2 += x * x; j += 1 }
        out(s * ks + c) = n2
        c += 1
      }
      s += 1
    }
    out
  }

  @inline private def elem(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (i >= v.numElements() || v.isNullAt(i)) 0.0
    else if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  private def invNorm(v: ArrayData, isFloat: Boolean): Double = {
    var n2 = 0.0
    var i = 0
    val n = math.min(v.numElements(), dim)
    while (i < n) { val x = elem(v, i, isFloat); n2 += x * x; i += 1 }
    if (n2 == 0.0) 0.0 else 1.0 / math.sqrt(n2)
  }

  /** The m-byte code: nearest centroid per subspace of the normalized
    * vector (deterministic lowest-index tiebreak).
    */
  def encode(v: ArrayData, isFloat: Boolean): Array[Byte] = {
    val inv = invNorm(v, isFloat)
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        var d = 0.0
        var j = 0
        val base = cbBase(s, c)
        while (j < subDim) {
          val x = elem(v, s * subDim + j, isFloat) * inv
          val t = x - codebooks(base + j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** ADC cosine: full-precision query (normalized on the fly) against
    * the code's reconstruction. Reads `m` corpus bytes per row — the
    * 32× I/O win — while the arithmetic stays one fused loop.
    */
  def adcCosine(code: Array[Byte], q: ArrayData, qIsFloat: Boolean): Double = {
    val inv = invNorm(q, qIsFloat)
    if (inv == 0.0) return 0.0
    var dot = 0.0
    var recon2 = 0.0
    var s = 0
    val n = math.min(code.length, m)
    while (s < n) {
      val c = code(s) & 0xFF
      val base = cbBase(s, c)
      var j = 0
      while (j < subDim) {
        dot += codebooks(base + j) * elem(q, s * subDim + j, qIsFloat) * inv
        j += 1
      }
      recon2 += cNorm2(s * ks + c)
      s += 1
    }
    if (recon2 == 0.0) 0.0 else dot / math.sqrt(recon2)
  }
}

object PqKernel {

  /** Deterministic per-subspace Lloyd's on a driver-side sample: each
    * sample vector L2-normalizes as a WHOLE (matching [[PqKernel.encode]]),
    * then every subspace trains its own `ks`-means over the subvectors —
    * init = first ks subvectors, fixed iteration count. Bounded driver
    * work: O(sample · m · ks · subDim · iters), corpus-size independent.
    */
  def train(sample: Array[Array[Float]], dim: Int, m: Int, ks: Int,
      iters: Int = 10): PqKernel = {
    require(sample.nonEmpty, "empty PQ training sample")
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val pts = sample.map { v =>
      val d = new Array[Double](dim)
      val n = math.min(v.length, dim)
      var n2 = 0.0
      for (j <- 0 until n) n2 += v(j).toDouble * v(j)
      val inv = if (n2 == 0.0) 0.0 else 1.0 / math.sqrt(n2)
      for (j <- 0 until n) d(j) = v(j) * inv
      d
    }
    val codebooks = new Array[Double](m * ks * subDim)
    // Subspaces are fully independent (disjoint input slices, disjoint
    // codebook ranges, per-subspace arithmetic order unchanged), so they
    // train in parallel bit-identically; inner loops are while-form —
    // the closure-per-element Range.foreach shape measured ~4× slower
    // on this 80M-op fit that every PQ invocation pays on the driver.
    java.util.stream.IntStream.range(0, m).parallel().forEach { s =>
      val n = pts.length
      val sub = new Array[Array[Double]](n)
      var i = 0
      while (i < n) {
        sub(i) = java.util.Arrays.copyOfRange(pts(i), s * subDim, (s + 1) * subDim)
        i += 1
      }
      val cents = Array.tabulate(ks)(i => sub(i % n).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ks)(new Array[Double](subDim))
        val counts = new Array[Int](ks)
        i = 0
        while (i < n) {
          val p = sub(i)
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < ks) {
            val cc = cents(c)
            var d = 0.0
            var j = 0
            while (j < subDim) { val t = p(j) - cc(j); d += t * t; j += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          val sb = sums(best)
          var j = 0
          while (j < subDim) { sb(j) += p(j); j += 1 }
          i += 1
        }
        var c = 0
        while (c < ks) {
          if (counts(c) > 0) {
            var j = 0
            while (j < subDim) { cents(c)(j) = sums(c)(j) / counts(c); j += 1 }
          }
          c += 1
        }
        it += 1
      }
      var c = 0
      while (c < ks) {
        System.arraycopy(cents(c), 0, codebooks, (s * ks + c) * subDim, subDim)
        c += 1
      }
    }
    new PqKernel(codebooks, dim, m, ks)
  }
}

/** `pq_encode(v)` → binary: the m-byte product-quantized code. */
case class PqEncode(child: Expression, kernel: PqKernel)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkVector(child.dataType, prettyName)
  override def prettyName: String = "graft_pq_encode"

  private lazy val elemFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    kernel.encode(input.asInstanceOf[ArrayData], elemFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val k = ctx.addReferenceObj("pqKernel", kernel,
        classOf[PqKernel].getName)
      s"${ev.value} = $k.encode($a, $elemFloat);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_cosine(code, q)` → double: ADC scoring of a code against a
  * full-precision query vector, codegen'd like [[PqEncode]].
  */
case class PqCosine(left: Expression, right: Expression, kernel: PqKernel)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case BinaryType => VectorExpressions.checkVector(right.dataType, prettyName)
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary code, vector), got ${other.simpleString}")
    }
  override def prettyName: String = "graft_pq_cosine"

  private lazy val qFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel.adcCosine(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[ArrayData], qFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val k = ctx.addReferenceObj("pqKernel", kernel,
        classOf[PqKernel].getName)
      s"${ev.value} = $k.adcCosine($a, $b, $qFloat);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqCosine = copy(left = newLeft, right = newRight)
}
