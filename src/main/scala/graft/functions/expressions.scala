package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static (Java-callable) kernel for [[PyToJson]] codegen: generated
  * whole-stage code calls this directly, one virtual call per row, no
  * Row boxing and no interpreted-expression detour. */
object PyToJsonKernel {
  def repair(s: UTF8String): UTF8String = {
    val out = PyLiteral.repairOrNull(s.toString)
    if (out == null) null else UTF8String.fromString(out)
  }
}

/** Catalyst-native scalar expression for the O9 JSON repair with full
  * codegen support: inside a WholeStageCodegen stage this emits a
  * direct static call into [[PyToJsonKernel]], so the surrounding
  * operators stay fused (no CodegenFallback row materialization, no
  * UDF serialization). The repair itself is a per-string parse either
  * way; what codegen buys is keeping the REST of the stage fused.
  */
case class PyToJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  // Pure function of the input → Catalyst's ConstantFolding collapses
  // repairs of literals at plan time.
  override def foldable: Boolean = child.foldable
  override def nullSafeEval(v: Any): Any =
    PyToJsonKernel.repair(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.PyToJsonKernel.repair($c);
      |${ev.isNull} = (${ev.value} == null);
      |""".stripMargin)
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
