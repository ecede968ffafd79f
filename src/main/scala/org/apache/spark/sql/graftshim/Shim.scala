package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{catalyst, classic, internal, Column}
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

  /** A user-built Column arrives as a [[classic.ColumnNodeExpression]]
    * wrapping a ColumnNode tree (UnresolvedFunction("and", ...)),
    * which only becomes And/GreaterThan/... during ANALYSIS — too
    * late for the manifest pruning evaluator, which reasons about
    * predicates driver-side, before any plan exists. This converts
    * the comparison/boolean shapes the evaluator understands into
    * their Catalyst forms; anything else becomes an opaque marker
    * attribute the evaluator treats as "may match" (never prunes) —
    * a lossy-but-SOUND translation, used for skipping only (the real
    * filter still runs through normal analysis). */
  def pruningExpression(c: Column): Expression =
    ExpressionUtils.expression(c) match {
      case classic.ColumnNodeExpression(node) => node2expr(node)
      case e => e
    }

  private def opaque: Expression =
    catalyst.analysis.UnresolvedAttribute(Seq("__graft_opaque__"))

  private def node2expr(node: internal.ColumnNode): Expression =
    node match {
      case f: internal.UnresolvedFunction =>
        val as = f.arguments.map(node2expr)
        (f.functionName, as) match {
          case ("and", Seq(a, b)) => catalyst.expressions.And(a, b)
          case ("or", Seq(a, b)) => catalyst.expressions.Or(a, b)
          case ("=" | "==", Seq(a, b)) => catalyst.expressions.EqualTo(a, b)
          case ("<=>", Seq(a, b)) =>
            catalyst.expressions.EqualNullSafe(a, b)
          case (">", Seq(a, b)) => catalyst.expressions.GreaterThan(a, b)
          case (">=", Seq(a, b)) =>
            catalyst.expressions.GreaterThanOrEqual(a, b)
          case ("<", Seq(a, b)) => catalyst.expressions.LessThan(a, b)
          case ("<=", Seq(a, b)) =>
            catalyst.expressions.LessThanOrEqual(a, b)
          case ("in", s) if s.length >= 2 =>
            catalyst.expressions.In(s.head, s.tail)
          // Column.isNull builds "isNull"; SQL text builds "isnull"
          case ("isnull" | "isNull", Seq(a)) =>
            catalyst.expressions.IsNull(a)
          case ("isnotnull" | "isNotNull", Seq(a)) =>
            catalyst.expressions.IsNotNull(a)
          case _ => opaque
        }
      case a: internal.UnresolvedAttribute =>
        catalyst.analysis.UnresolvedAttribute(a.nameParts)
      case l: internal.Literal =>
        l.dataType match {
          case Some(dt) => catalyst.expressions.Literal.create(l.value, dt)
          case None => catalyst.expressions.Literal(l.value)
        }
      case c: internal.Cast =>
        catalyst.expressions.Cast(node2expr(c.child), c.dataType)
      case _ => opaque
    }
}
