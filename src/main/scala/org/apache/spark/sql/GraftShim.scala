package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's native Catalyst expressions and the public
  * `Column` API. Spark 4 moved Column onto ColumnNode and made the
  * Expression⇄Column conversions `private[sql]`; this shim re-exports
  * just those two conversions for graft's internal wiring (the SQL-name
  * route via `SparkSessionExtensions` remains the public registration
  * surface).
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an analyzed logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]` in Spark 4).
    */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed plan behind a DataFrame. */
  def analyzed(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Analyzer-safe transformUp for custom resolution rules
    * (`resolveOperatorsUp` is `private[sql]`; plain `transformUp` asserts
    * when invoked from inside the analyzer).
    */
  def resolveOperatorsUp(plan: catalyst.plans.logical.LogicalPlan)(
      rule: PartialFunction[catalyst.plans.logical.LogicalPlan, catalyst.plans.logical.LogicalPlan])
      : catalyst.plans.logical.LogicalPlan =
    plan.resolveOperatorsUp(rule)
}
