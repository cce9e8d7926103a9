package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch as a distributed aggregate (Cormode & Muthukrishnan
  * 2005): a depth×width grid of counters; each item increments one
  * counter per row (row-seeded hash), a point estimate is the MINIMUM
  * over its cells. One-sided error — estimates never undercount, and
  * overcount by more than (e/width)·N with probability ≤ e^(−depth).
  * The buffer is O(depth·width) per task REGARDLESS of corpus size and
  * merge is cell-wise addition, so the shuffle carries one fixed-size
  * grid per partition where an exact groupBy would carry the
  * vocabulary — the frequency-ESTIMATE complement of [[FreqItemsAgg]]'s
  * membership summary (which tracks WHO is frequent but bounds counts
  * only from below). The reference keeps per-batch frequency stats in
  * its ingest metrics (`jobs/S3ToHudiOptStreamJob.scala:88-99` row-count
  * accounting); this is the sublinear generalization.
  *
  * Returns the grid as `array<long>` of depth·width+1 cells, the last
  * holding the total weight N (needed for the error bound);
  * [[CountMin.estimate]] reads point estimates out of the collected
  * array — the sketch IS the bounded summary, so collecting it is
  * O(depth·width), never O(corpus).
  */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(depth >= 1 && width >= 2, "count-min needs depth >= 1, width >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CountMin.add(buf, depth, width, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width + 1)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinAgg =
    copy(child = c(0))
}

object CountMin {

  /** Row-seeded cell index — MurmurHash3 with the row ordinal as seed
    * gives depth independent hash functions over one token.
    */
  private def cell(depth: Int, width: Int, row: Int, item: String): Int =
    row * width + math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(item, 0x9747b28c + row), width)

  private[graft] def add(buf: Array[Long], depth: Int, width: Int,
      item: String, w: Long): Unit = {
    var r = 0
    while (r < depth) { buf(cell(depth, width, r, item)) += w; r += 1 }
    buf(depth * width) += w
  }

  /** Point estimate from a collected sketch array: min over the item's
    * cells. Never less than the true count.
    */
  def estimate(cells: Seq[Long], depth: Int, width: Int, item: String): Long = {
    var m = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = cells(cell(depth, width, r, item))
      if (c < m) m = c
      r += 1
    }
    m
  }

  /** Total weight N the sketch has absorbed (the bound's scale). */
  def total(cells: Seq[Long], depth: Int, width: Int): Long = cells(depth * width)

  /** The CM guarantee's additive slack: ceil((e / width) · N). */
  def slack(cells: Seq[Long], depth: Int, width: Int): Long =
    math.ceil(math.E / width * total(cells, depth, width)).toLong
}
