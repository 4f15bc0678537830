package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr)` constructor; the supported
  * bridge (`classic.ExpressionUtils`) is `private[sql]`. This shim lives in
  * the `org.apache.spark.sql` namespace solely to re-export the two
  * conversions graft's native expressions need. No Spark internals are
  * re-implemented here.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
