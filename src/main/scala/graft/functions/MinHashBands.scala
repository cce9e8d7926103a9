package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_bands(text)` → array<long>: the document's LSH band hashes
  * in ONE codegen'd kernel pass — shingle the text
  * ([[TextKernels.shingleHashes]], the same 3-gram/whole-text rule as
  * the batch pipeline), take the `perms` universal-hash minima
  * ((a·x+b) mod p), and mix each band's `rowsPerBand` minima into one
  * 64-bit bucket key (splitmix64 chaining — band keys only GROUP equal
  * min-tuples; any avalanching mix works, and a rare collision only
  * adds a candidate the exact-Jaccard verify discards).
  *
  * This is the PER-ROW spelling of the batch `signatures` aggregate:
  * no (doc, shingle) explosion, no shuffle — the shape a streaming
  * stateless projection needs, and the row-local route a 100 TB scan
  * prefers when the shingle stream isn't reused by other aggregates.
  */
case class MinHashBands(child: Expression, permA: Array[Long],
    permB: Array[Long], prime: Long, numBands: Int)
    extends UnaryExpression {
  require(permA.length == permB.length, "permutation table shape mismatch")
  require(permA.length % numBands == 0, "perms must divide into bands")
  private val rowsPerBand = permA.length / numBands

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string, got ${other.simpleString}")
  }
  override def prettyName: String = "graft_minhash_bands"

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def kernel(text: UTF8String): ArrayData = {
    val shingles = TextKernels.shingleHashes(text)
    val nPerms = permA.length
    val mins = new Array[Long](nPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    val nSh = shingles.numElements()
    while (i < nSh) {
      val x = shingles.getLong(i)
      var p = 0
      while (p < nPerms) {
        val h = (permA(p) * x + permB(p)) % prime
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    val bands = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = mix64(b.toLong)
      var r = 0
      while (r < rowsPerBand) {
        h = mix64(h ^ mins(b * rowsPerBand + r))
        r += 1
      }
      bands(b) = h
      b += 1
    }
    new GenericArrayData(bands)
  }

  /** The raw signature minima (spec hook: pins per-row == aggregate). */
  def signatureOf(text: UTF8String): Array[Long] = {
    val shingles = TextKernels.shingleHashes(text)
    val nPerms = permA.length
    val mins = new Array[Long](nPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < shingles.numElements()) {
      val x = shingles.getLong(i)
      var p = 0
      while (p < nPerms) {
        val h = (permA(p) * x + permB(p)) % prime
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    mins
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ref = ctx.addReferenceObj("minhashBands", this,
        classOf[MinHashBands].getName)
      s"${ev.value} = $ref.kernel($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}
