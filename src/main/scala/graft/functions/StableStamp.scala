package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, TimestampType}

/** Wall-clock bookkeeping stamp whose GENERATED SOURCE is stable across
  * values.
  *
  * `current_timestamp()` finish-time-resolves to a plain `Literal`, and
  * literal codegen inlines the value into the generated Java source — so
  * every invocation of a query stamping "now" produces a DIFFERENT
  * source string for every codegen stage the column flows through, and
  * the whole-stage-codegen cache can never hit. Profiled on the bench:
  * ~25% of busy executor samples were tasks serialized on the janino
  * compile lock recompiling byte-identical-but-for-one-long classes,
  * per query invocation, per micro-batch (the streaming rule folds a
  * fresh `CurrentBatchTimestamp` literal each batch).
  *
  * This expression carries the stamp in the plan's REFERENCES array
  * instead (`references[i]`, the same slot mechanism the vector kernels
  * use for their model objects): the value still varies per invocation,
  * the source text does not, and compiled classes are reused. The stamp
  * is fixed at expression-construction time — for a bookkeeping column
  * excluded from every oracle surface, "when the pipeline was built"
  * and "when the batch ran" are equally honest ingest times, and the
  * construction-time value has the property the exactly-once specs
  * actually exercise: a REPLAYED pipeline restamps, a within-run
  * re-land keeps one value per pipeline.
  */
case class StableStamp(micros: Long) extends LeafExpression {
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "graft_ingest_stamp"
  override def eval(input: InternalRow): Any = micros

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftStampMicros",
      java.lang.Long.valueOf(micros), "java.lang.Long")
    ev.copy(
      code = code"final long ${ev.value} = $ref.longValue();",
      isNull = FalseLiteral)
  }
}
