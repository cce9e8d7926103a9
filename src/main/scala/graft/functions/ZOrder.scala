package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering key: per-column quantile-bucket ids,
  * bit-interleaved so a sort on the single key gives locality in EVERY
  * participating dimension at once — the multi-column data-skipping
  * layout behind Delta's OPTIMIZE ZORDER. A file then covers a small
  * hyper-rectangle, so min/max stats prune range queries on ANY z-column,
  * not just the leading sort column.
  */
object ZOrder {

  /** bucket(v) = #{boundaries ≤ v} via binary search over the quantile
    * cuts — a codegen'd O(log b) lookup (the declarative alternative, a
    * CASE chain over 255 cuts, defeats codegen branch prediction and
    * bloats the generated method past JIT limits).
    */
  case class RangeBucket(child: Expression, boundaries: Array[Double])
      extends UnaryExpression {
    require(boundaries.nonEmpty && boundaries.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      "boundaries must be ascending and distinct")

    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_range_bucket"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case _: IntegerType | _: LongType | _: DoubleType | _: FloatType |
           _: ShortType | _: ByteType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a primitive numeric column, got ${other.simpleString}")
    }

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[Number].doubleValue()
      val idx = java.util.Arrays.binarySearch(boundaries, v)
      if (idx >= 0) idx + 1 else -(idx + 1)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val b = ctx.addReferenceObj("boundaries", boundaries, "double[]")
        val idx = ctx.freshName("idx")
        s"""
          |int $idx = java.util.Arrays.binarySearch($b, (double) $c);
          |${ev.value} = ($idx >= 0) ? $idx + 1 : -($idx + 1);
        """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): RangeBucket =
      copy(child = newChild)
  }

  /** Interleaved key over bucketed columns: bit i of column j lands at
    * position `i * nCols + j`. Pure long arithmetic over the codegen'd
    * bucket ids — stays inside whole-stage codegen end to end.
    */
  def zorderKey(cols: Seq[Column], boundaries: Seq[Array[Double]], bits: Int = 8): Column = {
    require(cols.nonEmpty && cols.size == boundaries.size)
    require(cols.size * bits <= 63, "interleaved key must fit a long")
    // bucket ids range 0..boundaries.length; ids beyond 2^bits would have
    // their high bits silently truncated out of the interleave, putting
    // rows from opposite value ranges in the same z-neighborhood
    boundaries.foreach(b => require(b.length < (1 << bits),
      s"${b.length + 1} buckets need more than $bits bits — raise bits or lower buckets"))
    val ids = cols.zip(boundaries).map { case (c, b) =>
      GraftShim.column(RangeBucket(GraftShim.expression(c), b)).cast("long")
    }
    ids.zipWithIndex.flatMap { case (id, j) =>
      (0 until bits).map { i =>
        shiftright(id, i).bitwiseAND(lit(1L)) * lit(1L << (i * ids.size + j))
      }
    }.reduce(_ + _)
  }

  /** Distinct ascending quantile cuts for `column` (the bucket
    * boundaries): one approx-quantile sketch pass, never a sort.
    */
  def quantileBoundaries(df: org.apache.spark.sql.DataFrame, column: String,
      buckets: Int = 256): Array[Double] = {
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    df.stat.approxQuantile(column, probs, 0.001).distinct.sorted
  }
}
