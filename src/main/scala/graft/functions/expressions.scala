package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-native scalar expression for the O9 JSON repair: runs inside
  * the executor's expression tree (no UDF serialization overhead, no
  * Row boxing beyond the string itself). CodegenFallback keeps the
  * surrounding stage in whole-stage codegen; the repair itself is a
  * per-string parse either way, so interpreted eval of this node is not
  * the bottleneck — JSON parsing downstream dominates.
  */
case class PyToJson(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val out = PyLiteral.repairOrNull(v.asInstanceOf[UTF8String].toString)
    if (out == null) null else UTF8String.fromString(out)
  }
  override def prettyName: String = "py_to_json"
  override protected def withNewChildInternal(c: Expression): PyToJson =
    copy(child = c)
}

/** Column-API entry points for graft's custom expressions. */
object functions {
  /** Repair python-repr "JSON" (single quotes, True/None, trailing
    * commas, stray CR/LF) into strict JSON; null on unparseable input. */
  def py_to_json(c: Column): Column =
    Shim.column(PyToJson(Shim.expression(c)))
}
