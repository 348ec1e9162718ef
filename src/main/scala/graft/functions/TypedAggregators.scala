package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.metrics.RecordMetrics

/** Typed Dataset-API aggregators (SURVEY.md §2.9: the user-facing
  * `Aggregator[IN, BUF, OUT]` surface).
  */
object TypedAggregators {

  /** Combine per-batch load metrics into run totals —
    * `ds.select(TypedAggregators.metricsTotal.toColumn)` over a
    * `Dataset[RecordMetrics]` (the reference sums these dicts across
    * batches in consolidate_load_statistics, inaturalist.py:160-184).
    */
  val metricsTotal: Aggregator[RecordMetrics, RecordMetrics, RecordMetrics] =
    new Aggregator[RecordMetrics, RecordMetrics, RecordMetrics] {
      override def zero: RecordMetrics = RecordMetrics()
      override def reduce(b: RecordMetrics, a: RecordMetrics): RecordMetrics =
        b + a
      override def merge(b1: RecordMetrics, b2: RecordMetrics): RecordMetrics =
        b1 + b2
      override def finish(r: RecordMetrics): RecordMetrics = r
      override def bufferEncoder: Encoder[RecordMetrics] =
        Encoders.product[RecordMetrics]
      override def outputEncoder: Encoder[RecordMetrics] =
        Encoders.product[RecordMetrics]
    }
}
