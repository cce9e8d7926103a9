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
}
