package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column wrap a ColumnNode instead of an Expression; the
  * Expression<->Column converters live in `private[sql]`
  * org.apache.spark.sql.classic.ExpressionUtils. This shim re-exports
  * just those two entry points for graft's custom Catalyst expressions —
  * the usual technique for Spark extension libraries (same approach as
  * public connector/extension projects that need Column-from-Expression).
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
