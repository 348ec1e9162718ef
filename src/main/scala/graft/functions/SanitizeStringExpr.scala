package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** P4 string sanitization as a native codegen'd Catalyst expression —
  * ONE pass over the string instead of the translate + 2×regexp_replace
  * chain (3 passes, 2 regex engines) in CleanFunctions.sanitizeString.
  *
  * Semantics are byte-for-byte identical to the regex chain
  * (columns.py:145-157 reference semantics): double→single quote,
  * backspace dropped, `\s` runs ([ \t\n\x0B\f\r]) collapsed to one
  * space, leading/trailing whitespace trimmed. Equality with the regex
  * form is asserted in specs over the reference fixtures.
  */
case class SanitizeStringExpr(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sanitize_string requires STRING input, got ${child.dataType}")
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      SanitizeStringExpr.clean(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.SanitizeStringExpr.clean($c.toString()))")

  override protected def withNewChildInternal(c: Expression)
      : SanitizeStringExpr = copy(child = c)
}

object SanitizeStringExpr {

  /** Exactly the regex `\s` class (NOT Character.isWhitespace, which
    * also matches U+001C-1F and not U+000B consistently across
    * definitions).
    */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  def clean(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\u0008') () // drop backspace
      else if (isWs(c)) pendingSpace = sb.length() > 0 // trim leading
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(if (c == '"') '\'' else c)
      }
      i += 1
    }
    sb.toString // trailing run never flushed → trimmed
  }
}
