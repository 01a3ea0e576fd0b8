package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column <-> Expression conversion (Spark 4.x
  * wraps Column around ColumnNode; classic.ExpressionUtils does the
  * conversion but is sql-private). Lives in this package purely to widen
  * access for graft's custom Catalyst expressions.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
