package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Total fixed-point unigram log-likelihood of a text column under a
  * FROZEN pretrained unigram table (the CCNet-style LM quality filter:
  * the model is shipped to the data, never learned from it): for each
  * space-separated token, add `vocabFp(token)` — a negative log2
  * probability scaled by 1024 — or `oovFp` when the token is
  * out-of-vocabulary. ONE codegen'd per-row loop returning the exact
  * integer sum, so the per-document average is a deterministic
  * (order-independent) value both engines agree on bit-for-bit —
  * unlike a float sum, whose value depends on reduction order.
  *
  * Scale shape: the vocabulary rides along as a plan reference object
  * shipped once per executor (a real LM table is MBs, not TBs); its
  * byte-slice lookup map is @transient and rebuilt lazily after
  * deserialization. Scoring is embarrassingly parallel, zero shuffle,
  * zero row amplification — the explode + vocab-join + re-aggregate
  * formulation this replaces shuffles every token row twice.
  * Tokenization splits on single 0x20 bytes keeping empty tokens,
  * exactly `split(text, " ")` / DuckDB `string_split(text, ' ')`;
  * lookups compare raw UTF-8 byte slices (no per-token String garbage).
  */
case class UnigramScoreExpr(child: Expression, vocabFp: Map[String, Long],
    oovFp: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_score requires STRING input, got ${child.dataType}")

  override def dataType: DataType = LongType

  @transient private lazy val vocab = new UnigramVocab(vocabFp)

  override def nullSafeEval(v: Any): Any =
    UnigramScoreExpr.score(v.asInstanceOf[UTF8String], vocab, oovFp)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val vocabRef = ctx.addReferenceObj("unigramVocab", vocab,
      classOf[UnigramVocab].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramScoreExpr.score($c, $vocabRef, ${oovFp}L)")
  }

  override protected def withNewChildInternal(c: Expression): UnigramScoreExpr =
    copy(child = c)
}

/** Serializable vocabulary: plain byte arrays cross the wire; the
  * zero-copy ByteBuffer-keyed lookup map is rebuilt lazily per JVM.
  */
final class UnigramVocab(vocabFp: Map[String, Long]) extends Serializable {

  private val entryWords: Array[Array[Byte]] =
    vocabFp.keysIterator
      .map(_.getBytes(StandardCharsets.UTF_8)).toArray
  private val entryFps: Array[Long] = vocabFp.valuesIterator.toArray

  @transient private lazy val lookup: java.util.HashMap[ByteBuffer, java.lang.Long] = {
    val m = new java.util.HashMap[ByteBuffer, java.lang.Long](
      entryWords.length * 2)
    var i = 0
    while (i < entryWords.length) {
      m.put(ByteBuffer.wrap(entryWords(i)), Long.box(entryFps(i)))
      i += 1
    }
    m
  }

  def fpOf(bytes: Array[Byte], start: Int, len: Int): java.lang.Long =
    lookup.get(ByteBuffer.wrap(bytes, start, len))
}

object UnigramScoreExpr {

  def score(u: UTF8String, vocab: UnigramVocab, oovFp: Long): Long = {
    val bytes = u.getBytes
    val n = bytes.length
    var sum = 0L
    var start = 0
    while (start <= n) {
      var end = start
      while (end < n && bytes(end) != 0x20) end += 1
      val fp = vocab.fpOf(bytes, start, end - start)
      sum += (if (fp eq null) oovFp else fp.longValue())
      start = end + 1
    }
    sum
  }
}
