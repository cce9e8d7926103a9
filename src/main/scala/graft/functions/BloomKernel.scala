package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Distributed blocked-bloom builder: aggregates the k double-hashed bit
  * positions of every input row into ONE m-bit array per group, merged by
  * byte-wise OR — constant memory per task regardless of group size. This
  * is what makes a per-file bloom index buildable in a single pass over a
  * 100 TB write: each task carries m/8 bytes per open group and the
  * driver receives one byte array per file (a collect_set of positions
  * would ship O(rows) longs instead).
  *
  * Children are the two independent 64-bit hashes of the indexed value,
  * computed with codegen'd `xxhash64` in the caller's projection; bit
  * positions follow the Kirsch–Mitzenmacher double-hashing construction
  * pos_i = (h1 + i·h2) mod m, so the probe side only needs the same two
  * hashes of the literal.
  */
case class BloomBitsAgg(
    h1: Expression, h2: Expression, m: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {
  require(m > 0 && m % 8 == 0, "bloom bit count must be a positive multiple of 8")
  require(k > 0, "bloom needs at least one hash")

  override def children: Seq[Expression] = Seq(h1, h2)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val a = h1.eval(input)
    val b = h2.eval(input)
    // null hash = null input value; equality predicates never match null,
    // so nulls contribute no bits
    if (a != null && b != null)
      BloomKernel.setBits(buf, m, k, a.asInstanceOf[Long], b.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomBitsAgg =
    copy(h1 = c(0), h2 = c(1))
}

object BloomKernel {

  private[graft] def setBits(buf: Array[Byte], m: Int, k: Int, a: Long, b: Long): Unit = {
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(a + i.toLong * b, m.toLong).toInt
      buf(pos >>> 3) = (buf(pos >>> 3) | (1 << (pos & 7))).toByte
      i += 1
    }
  }

  /** Probe-side membership test mirroring [[BloomBitsAgg]]'s construction
    * exactly: false means the value is PROVABLY absent from the group the
    * bits summarize.
    */
  def mightContain(bits: Array[Byte], m: Int, k: Int, a: Long, b: Long): Boolean = {
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(a + i.toLong * b, m.toLong).toInt
      if ((bits(pos >>> 3) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }
}
