package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels for the similarity / near-dup family.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`/`transform`) are
  * interpreted — ~µs per element-step — which makes per-row vector math
  * (16 hyperplane dots × 64 dims = 1k multiply-adds per row) the hot-path
  * bottleneck. These expressions generate tight Java loops inside
  * whole-stage codegen instead: the same work runs at ns per
  * multiply-add, and the operators keep their single-pass, shuffle-free
  * shape at 100 TB.
  *
  * Both accept `array<float>` or `array<double>`; null input → null; null
  * elements are treated as 0.
  */
object VectorExpressions {

  /** Fixed random hyperplanes (seeded) shared by the signature expression
    * and any spec that wants to recompute signatures. MaxPlanes are
    * pre-drawn; each use picks its first `numPlanes` — ANN recall wants
    * short signatures (coarse buckets), near-dup precision wants long.
    */
  val MaxPlanes = 64
  val Dim = 64
  val PlanesFlat: Array[Double] = {
    val rnd = new scala.util.Random(7)
    Array.fill(MaxPlanes * Dim)(rnd.nextGaussian())
  }

  private[functions] def elementGetter(arr: String, idx: String, et: DataType): String =
    et match {
      case FloatType => s"($arr.isNullAt($idx) ? 0.0 : (double) $arr.getFloat($idx))"
      case _ => s"($arr.isNullAt($idx) ? 0.0 : $arr.getDouble($idx))"
    }

  private[functions] def elementAt(arr: ArrayData, idx: Int, et: DataType): Double =
    if (arr.isNullAt(idx)) 0.0
    else et match {
      case FloatType => arr.getFloat(idx).toDouble
      case _ => arr.getDouble(idx)
    }

  private[functions] def checkVector(dt: DataType, what: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$what expects array<float> or array<double>, got ${other.simpleString}")
    }
}

/** sig bit i = (v · planeᵢ ≥ 0) — the Charikar (2002) random-hyperplane
  * LSH signature, over the RAW vector (sign is invariant under positive
  * scaling, so normalization is skipped on this path).
  */
case class HyperplaneSig(child: Expression, numPlanes: Int) extends UnaryExpression {
  import VectorExpressions._
  require(numPlanes >= 1 && numPlanes <= MaxPlanes, s"numPlanes in [1, $MaxPlanes]")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    checkVector(child.dataType, prettyName)
  override def prettyName: String = "graft_hyperplane_sig"

  private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), Dim)
    var sig = 0L
    var i = 0
    while (i < numPlanes) {
      var s = 0.0
      var j = 0
      while (j < n) { s += elementAt(arr, j, elemType) * PlanesFlat(i * Dim + j); j += 1 }
      if (s >= 0.0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val planes = ctx.addReferenceObj("planes", PlanesFlat, "double[]")
      val (sig, n, i, j, s) = (ctx.freshName("sig"), ctx.freshName("n"),
        ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("s"))
      s"""
        |long $sig = 0L;
        |int $n = java.lang.Math.min($arr.numElements(), $Dim);
        |for (int $i = 0; $i < $numPlanes; $i++) {
        |  double $s = 0.0;
        |  for (int $j = 0; $j < $n; $j++) {
        |    $s += ${elementGetter(arr, j, elemType)} * $planes[$i * $Dim + $j];
        |  }
        |  if ($s >= 0.0) $sig |= (1L << $i);
        |}
        |${ev.value} = $sig;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** Distinct word-3-shingle 32-bit hashes of a string — the shared map-side
  * primitive of the MinHash/Jaccard family. The tokenize+hash loop runs in
  * a JVM kernel ([[TextKernels.shingleHashes]]): the declarative
  * formulation (transform over a token sequence) is interpreted
  * per-element and measured ~100× slower.
  */
case class ShingleHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashes(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val kernel = ctx.addReferenceObj("textKernels", TextKernels,
        "graft.functions.TextKernels$")
      s"${ev.value} = $kernel.shingleHashes($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

/** Word n-grams joined by single spaces — see [[TextKernels.wordNgrams]].
  * The shared exploded primitive of decontamination (n=8) and repetition
  * scoring (n=2); string output keeps the DuckDB oracles expressible.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram size must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }
  override def prettyName: String = "graft_word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.wordNgrams(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val kernel = ctx.addReferenceObj("textKernels", TextKernels,
        "graft.functions.TextKernels$")
      s"${ev.value} = $kernel.wordNgrams($s, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** Duplicated-span removal kernel: probes each positional k-gram of the
  * document against a BROADCAST hash set of corpus-duplicated spans and
  * excises every covered token — see [[TextKernels.removeSpans]]. The
  * span set rides a `Broadcast` handle (one torrent-shipped copy per
  * executor, not one array copy per task closure) and materializes as a
  * per-executor `HashSet` on first probe; inside whole-stage codegen the
  * per-row cost is O(tokens) hash probes, replacing the interpreted
  * `transform`/`array_contains`-over-literal spelling whose cost was
  * O(tokens × |dupSet|) string comparisons per document.
  */
case class RemoveSpans(child: Expression,
    spans: org.apache.spark.broadcast.Broadcast[Array[String]], k: Int)
  extends UnaryExpression {
  require(k >= 1, "span length must be positive")
  override def dataType: DataType = StructType(Seq(
    StructField("cleaned", StringType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }
  override def prettyName: String = "graft_remove_spans"

  @transient private lazy val spanSet = {
    val arr = spans.value
    val h = new java.util.HashSet[String](math.max(16, arr.length * 2))
    arr.foreach(h.add)
    h
  }

  def kernel(text: org.apache.spark.unsafe.types.UTF8String): Any =
    TextKernels.removeSpans(text, k, spanSet)

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val ref = ctx.addReferenceObj("removeSpans", this,
        classOf[RemoveSpans].getName)
      s"${ev.value} = (InternalRow) $ref.kernel($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): RemoveSpans =
    copy(child = newChild)
}

/** Single-pass stopword-hit counts per language plus the CJK codepoint
  * count, as a struct (s_en, s_de, s_fr, s_es, s_zh) — see
  * [[TextKernels.stopwordHits]].
  */
case class StopwordHits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(
    TextKernels.StopwordLangs.map { case (lang, _) =>
      StructField(s"s_$lang", IntegerType, nullable = false)
    } :+ StructField("s_zh", IntegerType, nullable = false))
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }
  override def prettyName: String = "graft_stopword_hits"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.stopwordHits(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val kernel = ctx.addReferenceObj("textKernels", TextKernels,
        "graft.functions.TextKernels$")
      s"${ev.value} = $kernel.stopwordHits($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

/** Rolling polynomial fingerprint of a string (order-sensitive content
  * hash) — see [[TextKernels.rollingFingerprint]].
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.rollingFingerprint(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val kernel = ctx.addReferenceObj("textKernels", TextKernels,
        "graft.functions.TextKernels$")
      s"${ev.value} = $kernel.rollingFingerprint($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** Unicode NFC normalization — see [[TextKernels.nfcNormalize]] for the
  * ASCII/already-composed fast paths. Exists because Spark has no
  * built-in Unicode normalizer; the DuckDB oracle side is its native
  * `nfc_normalize`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
    }
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.nfcNormalize(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val kernel = ctx.addReferenceObj("textKernels", TextKernels,
        "graft.functions.TextKernels$")
      s"${ev.value} = $kernel.nfcNormalize($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** cos(a, b) = a·b / (|a||b|), 0.0 when either norm is 0 (never NaN).
  * One fused loop over min(len(a), len(b)) elements.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  import VectorExpressions._

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVector(left.dataType, prettyName)
    if (l.isFailure) l else checkVector(right.dataType, prettyName)
  }
  override def prettyName: String = "graft_cosine"

  private lazy val leftElem = left.dataType.asInstanceOf[ArrayType].elementType
  private lazy val rightElem = right.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = elementAt(x, i, leftElem); val yi = elementAt(y, i, rightElem)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, dot, na, nb, xi, yi) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("dot"), ctx.freshName("na"), ctx.freshName("nb"),
        ctx.freshName("xi"), ctx.freshName("yi"))
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $xi = ${elementGetter(a, i, leftElem)};
        |  double $yi = ${elementGetter(b, i, rightElem)};
        |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        |}
        |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** int8 scalar quantization: per-dimension affine codes
  * `code_i = round((v_i - min_i) / scale_i)` clamped to 0..255, packed
  * as one byte per dimension — a 4× footprint cut for float vectors
  * (16× vs doubles) that turns a 100 TB embedding scan into a 25 TB
  * one. `mins`/`scales` are the corpus-trained per-dimension affine
  * table (64 floats — rides in the expression itself, no broadcast
  * machinery needed).
  */
case class QuantizeVec(child: Expression,
    mins: Array[Float], scales: Array[Float]) extends UnaryExpression {
  require(mins.length == scales.length, "quantizer table shape mismatch")
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkVector(child.dataType, prettyName)
  override def prettyName: String = "graft_quantize"

  private lazy val elem = child.dataType.asInstanceOf[ArrayType].elementType

  def kernel(arr: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] = {
    val n = math.min(arr.numElements(), mins.length)
    val out = new Array[Byte](mins.length)
    var i = 0
    while (i < n) {
      val s = scales(i)
      val c =
        if (s <= 0f) 0
        else {
          val x = math.round(
            (VectorExpressions.elementAt(arr, i, elem) - mins(i)) / s).toInt
          if (x < 0) 0 else if (x > 255) 255 else x
        }
      out(i) = c.toByte
      i += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("quantizeVec", this, classOf[QuantizeVec].getName)
      s"${ev.value} = $ref.kernel($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

/** Asymmetric cosine (ADC): the FULL-precision query against a
  * RECONSTRUCTED corpus code (`min_i + code_i·scale_i`) — the standard
  * quantized-search scoring, one fused loop over 64 bytes per row. The
  * candidate scan reads codes only; raw vectors are touched again only
  * for the exact re-rank of the shortlist.
  */
case class QuantizedCosine(left: Expression, right: Expression,
    mins: Array[Float], scales: Array[Float]) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case BinaryType => VectorExpressions.checkVector(right.dataType, prettyName)
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary code, vector), got ${other.simpleString}")
    }
  override def prettyName: String = "graft_quantized_cosine"

  private lazy val qElem = right.dataType.asInstanceOf[ArrayType].elementType

  def kernel(code: Array[Byte],
      q: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(code.length, q.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val a = mins(i) + (code(i) & 0xFF) * scales(i)
      val b = VectorExpressions.elementAt(q, i, qElem)
      dot += a * b; na += a * a; nb += b * b
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("quantizedCosine", this,
        classOf[QuantizedCosine].getName)
      s"${ev.value} = $ref.kernel($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCosine =
    copy(left = newLeft, right = newRight)
}

/** `l2_normalize(v)` → array<float>: the unit-norm copy of a vector
  * (zero vectors pass through as zeros) — one fused loop, codegen'd.
  * The centroid-update half of a Lloyd iteration aggregates THESE, so
  * cluster means live in the same normalized space the assignment
  * kernel measures distances in.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkVector(child.dataType, prettyName)
  override def prettyName: String = "graft_l2_normalize"

  private lazy val elem = child.dataType.asInstanceOf[ArrayType].elementType

  def kernel(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val out = new Array[Float](n)
    var norm = 0.0
    var i = 0
    while (i < n) {
      val x = VectorExpressions.elementAt(arr, i, elem)
      out(i) = x.toFloat
      norm += x * x
      i += 1
    }
    if (norm > 0.0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0
      while (i < n) { out(i) *= inv; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("l2normalize", this, classOf[L2Normalize].getName)
      s"${ev.value} = $ref.kernel($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): L2Normalize =
    copy(child = newChild)
}
