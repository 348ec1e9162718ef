package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `json.dumps(ensure_ascii=False)` string-content escaping as ONE
  * codegen'd pass (reference serializes JSON fields with exactly that
  * call — `columns.py:333,555`): backslash and double quote escape,
  * \b \t \n \f \r use their short forms, every other control char
  * below 0x20 becomes `\u00xx` (lowercase hex), and non-ASCII passes
  * through raw.
  *
  * Replaces an 8-step regexp_replace chain that silently let
  * U+0001-U+0007 and U+000E-U+001F through unescaped (invalid JSON
  * and a divergence from json.dumps).
  */
case class JsonEscapeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"json_escape requires STRING input, got ${child.dataType}")
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      JsonEscapeExpr.escape(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.JsonEscapeExpr.escape($c.toString()))")

  override protected def withNewChildInternal(c: Expression)
      : JsonEscapeExpr = copy(child = c)
}

object JsonEscapeExpr {

  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\\' => sb.append("\\\\")
        case '"' => sb.append("\\\"")
        case '\b' => sb.append("\\b")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\f' => sb.append("\\f")
        case '\r' => sb.append("\\r")
        case _ if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
