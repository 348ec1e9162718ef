package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.{DotProductExpr, HtmlToTextExpr, MinHashSigExpr,
  PercentileDiscAgg, SanitizeStringExpr, ShingleSetExpr, SimHashExpr,
  WinnowFingerprintsExpr}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst pieces at session build time
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`):
  * `percentile_disc_exact(x, p)` — exact Postgres discrete percentile —
  * and the CollapseSanitize optimizer rule (idempotent-sanitize
  * elimination).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("percentile_disc_exact"),
      new ExpressionInfo(classOf[PercentileDiscAgg].getName,
        "percentile_disc_exact"),
      PercentileDiscAgg.builder))
    e.injectFunction((
      FunctionIdentifier("sanitize_string"),
      new ExpressionInfo(classOf[SanitizeStringExpr].getName,
        "sanitize_string"),
      exprs => SanitizeStringExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("html_to_text"),
      new ExpressionInfo(classOf[HtmlToTextExpr].getName,
        "html_to_text"),
      exprs => HtmlToTextExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      exprs => DotProductExpr(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash64"),
      exprs => SimHashExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      exprs => MinHashSigExpr(exprs.head,
        GraftExtensions.litInt(exprs(1), "minhash_sig shingleK"),
        GraftExtensions.litInt(exprs(2), "minhash_sig numHashes"))))
    e.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprintsExpr].getName,
        "winnow_fingerprints"),
      exprs => WinnowFingerprintsExpr(exprs.head,
        GraftExtensions.litInt(exprs(1), "winnow_fingerprints k"),
        GraftExtensions.litInt(exprs(2), "winnow_fingerprints w"))))
    e.injectFunction((
      FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSetExpr].getName, "shingle_set"),
      exprs => ShingleSetExpr(exprs.head,
        GraftExtensions.litInt(exprs(1), "shingle_set k"))))
    e.injectOptimizerRule(_ => graft.plans.CollapseSanitize)
  }
}

object GraftExtensions {
  /** Fold a SQL argument that must be a constant int (the shape/width
    * parameters of the signature expressions — they size generated
    * code, so they cannot vary per row).
    */
  private[graft] def litInt(e: Expression, what: String): Int =
    if (!e.foldable)
      throw new IllegalArgumentException(s"$what must be a constant")
    else e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other =>
        throw new IllegalArgumentException(
          s"$what must be an integer literal, got $other")
    }

  /** Register every SQL-surface function on an existing session (the
    * extensions path requires registration at session BUILD time;
    * tests and notebooks attach to a live session instead).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("sanitize_string",
      exprs => SanitizeStringExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("html_to_text",
      exprs => HtmlToTextExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      exprs => DotProductExpr(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHashExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashSigExpr(exprs.head,
        litInt(exprs(1), "minhash_sig shingleK"),
        litInt(exprs(2), "minhash_sig numHashes")), "built-in")
    reg.createOrReplaceTempFunction("winnow_fingerprints",
      exprs => WinnowFingerprintsExpr(exprs.head,
        litInt(exprs(1), "winnow_fingerprints k"),
        litInt(exprs(2), "winnow_fingerprints w")), "built-in")
    reg.createOrReplaceTempFunction("shingle_set",
      exprs => ShingleSetExpr(exprs.head,
        litInt(exprs(1), "shingle_set k")), "built-in")
    PercentileDiscAgg.register(spark)
  }
}
