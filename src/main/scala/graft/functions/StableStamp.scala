package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
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
  * The stamp here is read from the wall clock ONCE PER TASK (partition
  * initialization — the same mechanism as `monotonically_increasing_id`),
  * so the generated source carries no value at all: compiled classes are
  * reused across invocations AND each micro-batch of a long-lived
  * pipeline stamps its own arrival time (a construction-time constant
  * would freeze "pipeline start" into every batch, misleading lag or
  * retention readers of `ingest_ts`). Bookkeeping column only — excluded
  * from every oracle surface; a replayed pipeline restamps.
  */
case class StableStamp() extends LeafExpression with Nondeterministic {
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_ingest_stamp"

  @transient private var stampMicros: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    stampMicros = System.currentTimeMillis() * 1000L

  override protected def evalInternal(input: InternalRow): Any = stampMicros

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stamp = ctx.addMutableState(CodeGenerator.JAVA_LONG, "graftStampMicros")
    ctx.addPartitionInitializationStatement(
      s"$stamp = System.currentTimeMillis() * 1000L;")
    ev.copy(
      code = code"final long ${ev.value} = $stamp;",
      isNull = FalseLiteral)
  }
}
