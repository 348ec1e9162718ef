package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.PercentileDiscAgg

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst functions at session build time
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`). Currently:
  * `percentile_disc_exact(x, p)` — exact Postgres discrete percentile.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("percentile_disc_exact"),
      new ExpressionInfo(classOf[PercentileDiscAgg].getName,
        "percentile_disc_exact"),
      PercentileDiscAgg.builder))
  }
}
