package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Load-run reporting (SURVEY.md §2.4 A10/A13): the per-stage record
  * counts the reference accumulates across batches and posts per run
  * (`catalog/dags/common/loader/reporting.py:26-87`,
  * `loader/loader.py:57-67`).
  */
final case class RecordMetrics(
    staged: Long = 0, missing: Long = 0, fidDup: Long = 0,
    urlDup: Long = 0, upserted: Long = 0) {
  /** Batch totals combine additively across batches/tiers. */
  def +(o: RecordMetrics): RecordMetrics = RecordMetrics(
    staged + o.staged, missing + o.missing, fidDup + o.fidDup,
    urlDup + o.urlDup, upserted + o.upserted)

  def report(provider: String): String =
    s"$provider: staged=$staged missing=$missing fid_dup=$fidDup " +
      s"url_dup=$urlDup upserted=$upserted"
}

object RecordMetrics {
  /** Derive the funnel metrics from the stage frames in ONE job each —
    * counts are actions, so callers should pass cached frames when
    * deriving several.
    */
  def fromStages(staged: DataFrame, afterRequired: DataFrame,
      afterFidDedup: DataFrame, merged: DataFrame): RecordMetrics = {
    val n0 = staged.count()
    val n1 = afterRequired.count()
    val n2 = afterFidDedup.count()
    val n3 = merged.count()
    RecordMetrics(staged = n0, missing = n0 - n1, fidDup = n1 - n2,
      urlDup = n2 - n3, upserted = n3)
  }
}
