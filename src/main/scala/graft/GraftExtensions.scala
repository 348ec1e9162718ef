package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotProductExpr, HtmlToTextExpr,
  PercentileDiscAgg, SanitizeStringExpr, SimHashExpr}

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
    e.injectOptimizerRule(_ => graft.plans.CollapseSanitize)
  }
}
