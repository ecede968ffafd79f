package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point: registers graft's custom
  * Catalyst expressions as SQL-callable functions, so the SQL surface
  * and the Column API expose the SAME expression nodes (one
  * implementation, two front doors — a user writing
  * `SELECT top_gram(text, 2).frac` gets the identical codegen'd plan
  * the DataFrame API builds). Activated everywhere via
  * `spark.sql.extensions=graft.GraftExtensions` in
  * [[Tables.sessionConfs]]; q16 gates the SQL path against the same
  * oracle as the Column path. This is the standard extension-library
  * wiring (injectFunction); no custom rules or strategies are
  * injected because no operator here needs one (SURVEY §7.3). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("py_to_json"),
      new ExpressionInfo(classOf[graft.functions.PyToJson].getName,
        "py_to_json"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "py_to_json(str)")
        graft.functions.PyToJson(exprs.head)
      }))
    e.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[graft.functions.NfcNormalizeExpr].getName,
        "nfc_normalize"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "nfc_normalize(str)")
        graft.functions.NfcNormalizeExpr(exprs.head)
      }))
    e.injectFunction((FunctionIdentifier("top_gram"),
      new ExpressionInfo(classOf[graft.functions.TopGramExpr].getName,
        "top_gram"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "top_gram(str, n)")
        val n = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"top_gram's n must be an INTEGER literal, got $other")
        }
        graft.functions.TopGramExpr(exprs.head, n)
      }))
  }
}
