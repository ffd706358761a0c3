package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(Expression)` constructor; the
  * supported conversion lives in `private[sql] ExpressionUtils`. This
  * shim (in an org.apache.spark.sql subpackage, the established idiom
  * for Spark extension libraries) re-exports just the two conversions
  * graft's native Catalyst expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
