package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Expression <-> Column converters so
  * graft's native Catalyst expressions (e.g. graft.functions.DotProduct)
  * can surface as ordinary Columns. This is the conventional extension
  * seam for libraries shipping custom expressions on Spark 4.x.
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
