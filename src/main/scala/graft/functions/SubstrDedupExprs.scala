package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Expression pair for exact duplicate-substring removal
  * ([[graft.operators.Dedupe.exactSubstrDedup]], the ExactSubstr
  * operator of Lee et al. 2022, arXiv:2107.06499).
  *
  * Positions are 1-based Unicode CODEPOINT indices — the unit DuckDB's
  * `substr` and Spark's `substring` both count, so a position computed
  * here selects the same window in the oracle SQL.
  */
object SubstrDedupExprs

/** Rolling 64-bit hashes of every L-codepoint window of a text, as ONE
  * codegen'd per-row loop returning `array<long>` (index i = window at
  * codepoint position i+1). Texts shorter than L return an EMPTY array.
  *
  * Polynomial rolling hash in wrapping long arithmetic (base 1000003;
  * h(p+1) = (h(p) − c_p·B^(L−1))·B + c_{p+L−1}) — deterministic and
  * O(1) per position. Collisions are harmless: the consumer re-verifies
  * candidate windows on the REAL substring before any removal, so hash
  * quality affects candidate volume only, never results.
  */
case class GramHashesExpr(child: Expression, length: Int)
  extends UnaryExpression {

  require(length >= 2, s"gram_hashes needs length >= 2, got $length")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires STRING input, got ${child.dataType}")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    GramHashesExpr.gramHashes(v.asInstanceOf[UTF8String], length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramHashesExpr.gramHashes($c, $length)")

  override protected def withNewChildInternal(c: Expression): GramHashesExpr =
    copy(child = c)
}

object GramHashesExpr {

  private val Empty = new GenericArrayData(Array.empty[Long])
  final val Base = 1000003L

  def gramHashes(u: UTF8String, gramLen: Int): ArrayData = {
    val s = u.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < gramLen) return Empty
    var pow = 1L
    var i = 0
    while (i < gramLen - 1) { pow *= Base; i += 1 }
    val out = new Array[Long](n - gramLen + 1)
    var h = 0L
    i = 0
    while (i < gramLen) { h = h * Base + cps(i); i += 1 }
    out(0) = h
    var p = 1
    while (p <= n - gramLen) {
      h = (h - cps(p - 1) * pow) * Base + cps(p + gramLen - 1)
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Remove the union of the L-codepoint windows starting at `starts`
  * (SORTED, 1-based codepoint positions) from a text and stitch the
  * remainder: returns struct(clean_text, n_spans, removed_chars).
  * Runs of starts with successive gap ≤ L merge into one span (their
  * removed intervals overlap or touch). An empty `starts` returns the
  * text unchanged with zero spans.
  *
  * One O(len) pass per row via a static call (same fused-loop shape as
  * the other text expressions); the per-row cost is the string
  * assembly itself, so there is nothing corpus-sized to push further
  * down.
  */
case class CutSpansExpr(text: Expression, starts: Expression, length: Int)
  extends BinaryExpression {

  require(length >= 2, s"cut_spans needs length >= 2, got $length")

  override def left: Expression = text
  override def right: Expression = starts

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType &&
        starts.dataType.isInstanceOf[ArrayType] &&
        starts.dataType.asInstanceOf[ArrayType].elementType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cut_spans requires (STRING, ARRAY<INT>), got " +
        s"(${text.dataType}, ${starts.dataType})")

  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_spans", LongType, nullable = false),
    StructField("removed_chars", LongType, nullable = false)))

  override def nullSafeEval(t: Any, st: Any): Any =
    CutSpansExpr.cutSpans(t.asInstanceOf[UTF8String],
      st.asInstanceOf[ArrayData], length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, (t, st) =>
      s"graft.functions.CutSpansExpr.cutSpans($t, $st, $length)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CutSpansExpr =
    copy(text = newLeft, starts = newRight)
}

object CutSpansExpr {

  def cutSpans(u: UTF8String, startsArr: ArrayData, gramLen: Int)
      : InternalRow = {
    val m = startsArr.numElements()
    if (m == 0)
      return new GenericInternalRow(Array[Any](u, 0L, 0L))
    val starts = startsArr.toIntArray()
    val s = u.toString
    // codepoint index -> Java char offset (identity for BMP-only text)
    val ncp = s.codePointCount(0, s.length)
    val charAt = new Array[Int](ncp + 1)
    var ci = 0
    var cp = 0
    while (cp < ncp) { charAt(cp) = ci; ci += Character.charCount(s.codePointAt(ci)); cp += 1 }
    charAt(ncp) = s.length
    val sb = new java.lang.StringBuilder(s.length)
    var nSpans = 0L
    var removed = 0L
    var keptFrom = 1              // 1-based codepoint, inclusive
    var spanStart = starts(0)
    var spanEnd = starts(0) + gramLen  // [spanStart, spanEnd) 1-based
    var i = 1
    def flush(): Unit = {
      if (spanStart > keptFrom)
        sb.append(s, charAt(keptFrom - 1), charAt(spanStart - 1))
      nSpans += 1
      removed += spanEnd - spanStart
      keptFrom = spanEnd
    }
    while (i < m) {
      val p = starts(i)
      if (p - starts(i - 1) > gramLen) { // new island: gap > L
        spanEnd = starts(i - 1) + gramLen
        flush()
        spanStart = p
      }
      i += 1
    }
    spanEnd = starts(m - 1) + gramLen
    flush()
    if (keptFrom <= ncp)
      sb.append(s, charAt(keptFrom - 1), charAt(ncp))
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), nSpans, removed))
  }
}
