package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column <-> catalyst Expression conversions —
  * the standard pattern for Spark extension libraries that ship custom
  * Catalyst expressions (Spark 4 moved Column onto ColumnNode; classic
  * conversions live behind private[sql]).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
