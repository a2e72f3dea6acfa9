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

  /** Register an expression builder into an EXISTING session's function
    * registry (the runtime twin of `SparkSessionExtensions.injectFunction`,
    * which only applies at session build time). Registry access is
    * private[sql], hence the bridge.
    */
  def registerFunction(
      spark: SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression
  ): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(name, info, builder)
}
