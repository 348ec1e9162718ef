package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** P17 HTML→text as a native codegen'd Catalyst expression. The Column
  * form (CleanFunctions.htmlToText) runs SIX regex passes (tag strip,
  * four entity decodes, whitespace collapse); this replaces the regex
  * engines with two single-pass scans plus four literal replaces —
  * byte-identical output, asserted against the regex chain in specs
  * (including the cascade case: `&amp;lt;` decodes to `<` because the
  * amp pass runs before the lt pass, exactly like the chain).
  *
  * Reference semantics: `wikimedia_commons.py` description cleanup /
  * the loader's HTML-bearing description fields.
  */
case class HtmlToTextExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_to_text requires STRING input, got ${child.dataType}")
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      HtmlToTextExpr.clean(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.HtmlToTextExpr.clean($c.toString()))")

  override protected def withNewChildInternal(c: Expression)
      : HtmlToTextExpr = copy(child = c)
}

object HtmlToTextExpr {

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  def clean(s: String): String = {
    // pass 1: `<[^>]*>` → one space; an unclosed `<` stays literal
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i + 1)
        if (close >= 0) { sb.append(' '); i = close }
        else sb.append(c)
      } else sb.append(c)
      i += 1
    }
    // passes 2-5: entity decode in CHAIN ORDER (amp first → cascades)
    var t = sb.toString
    t = t.replace("&amp;", "&")
    t = t.replace("&lt;", "<")
    t = t.replace("&gt;", ">")
    t = t.replace("&quot;", "\"")
    // pass 6: `\s+` → one space, trimmed
    val out = new java.lang.StringBuilder(t.length)
    var pendingSpace = false
    var j = 0
    while (j < t.length) {
      val c = t.charAt(j)
      if (isWs(c)) pendingSpace = out.length() > 0
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      j += 1
    }
    out.toString
  }
}
