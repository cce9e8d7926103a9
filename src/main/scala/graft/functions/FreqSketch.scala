package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a distributed aggregate — the
  * one-pass heavy-hitter summary (Misra & Gries 1982; mergeability per
  * Agarwal et al. 2013, "Mergeable Summaries"): each task tracks at
  * most `k` counters, so memory is O(k) per task REGARDLESS of corpus
  * size, and the guarantee survives the shuffle-side merge — every item
  * with true frequency > n/(k+1) is present in the final summary. The
  * exact groupBy alternative shuffles one row per distinct token
  * (vocabulary-sized at 100 TB); this shuffles one k-entry summary per
  * partition.
  *
  * The classic two-pass heavy-hitter protocol rides on top: pass 1
  * produces the candidate set (this aggregate), pass 2 recounts ONLY
  * the candidates exactly (a broadcast `isin` filter — the shuffle
  * carries hits, not vocabulary), so the final top-N is EXACT whenever
  * the guarantee covers rank N. See `TextOps.heavyHitters`.
  *
  * Returns the candidate items as `array<string>`, residual-count
  * descending then lexicographic — deterministic for specs; callers
  * recount anyway.
  */
case class FreqItemsAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {
  require(k >= 1, "frequent-items sketch needs k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](k * 2)

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) FreqSketch.offer(buf, k, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    other.forEach((t, c) => FreqSketch.offer(buf, k, t, c))
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any =
    new GenericArrayData(buf.asScala.toSeq.sortBy { case (t, c) => (-c, t) }
      .map { case (t, _) => UTF8String.fromString(t): Any }.toArray)

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed raw UTF-8, NOT writeUTF: modified-UTF-8 caps one
    // string at 64 KB and a web corpus tokenized on whitespace will
    // eventually carry a longer unbroken run (base64 blob, minified JS)
    // — the sketch must summarize it, not crash the shuffle
    buf.forEach { (t, c) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = c(0))
}

object FreqSketch {

  /** Misra–Gries offer with weight `w` (weighted form makes update and
    * merge the same operation — Agarwal et al.'s mergeable spelling):
    * increment if tracked; adopt if a slot is free; otherwise subtract
    * the capacity-violation decrement from every counter and drop the
    * ones that hit zero. The decrement step is O(k) but runs at most
    * once per k offers amortized.
    */
  private[graft] def offer(m: java.util.HashMap[String, Long], k: Int,
      item: String, w: Long): Unit = {
    val cur = m.get(item)
    if (cur != 0L || m.containsKey(item)) { m.put(item, cur + w); return }
    if (m.size < k) { m.put(item, w); return }
    // find the smallest count; decrement everything by min(w, that)
    var minC = Long.MaxValue
    val it0 = m.values().iterator()
    while (it0.hasNext) { val c = it0.next(); if (c < minC) minC = c }
    val dec = math.min(w, minC)
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nc = e.getValue - dec
      if (nc <= 0L) it.remove() else e.setValue(nc)
    }
    val rem = w - dec
    if (rem > 0L && m.size < k) m.put(item, rem)
  }
}
