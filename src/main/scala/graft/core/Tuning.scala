package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spill-aware sizing helpers (SCALING.md): pick shuffle parallelism
  * from the optimizer's size estimate so a post-shuffle partition
  * targets a spill-safe byte budget, instead of inheriting whatever
  * `spark.sql.shuffle.partitions` happens to be. AQE coalesces DOWN
  * from an over-partitioned shuffle but never splits an
  * under-partitioned one (outside skew-join handling) — so the static
  * number still matters at 100 TB, and it should come from data size,
  * not a constant.
  */
object Tuning {

  /** Partitions so each holds ~targetBytes of the frame's estimated
    * size (Catalyst stats: file sizes + filter selectivity when CBO
    * has them).
    */
  def shufflePartitionsFor(df: DataFrame,
      targetBytes: Long = 128L << 20,
      min: Int = 1, max: Int = 200000): Int = {
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val p = (size + targetBytes - 1) / targetBytes
    // clamp BEFORE narrowing: stats default to Long.MaxValue for
    // unknown-size plans, and a BigInt that large truncates to 0 via
    // .toLong.toInt — the biggest inputs would get ONE partition
    p.min(BigInt(max)).max(BigInt(min)).toInt
  }

  /** Typical span of the half-open intervals [loCol, hiCol) in `df`:
    * the approximate median (by default) of `hi - lo` over the valid
    * (lo < hi) rows, clamped to >= 1.
    *
    * This is the bin-width statistic for the binned temporal joins
    * (TemporalJoins): a bin of ~one typical interval length keeps
    * replication at ceil(len/bin)+1 ~ 2 per interval while keeping
    * bin-local candidate lists narrow. It costs ONE scalar aggregation
    * job over `df` — the same class of driver-side tuning stat as
    * [[shufflePartitionsFor]]; callers whose interval frame is an
    * expensive sub-plan should persist it first or pass an explicit
    * width instead. The chosen width never affects RESULTS (the joins
    * re-filter with the exact predicate), only the plan's replication/
    * collision balance — so the approximate percentile's merge-order
    * wobble is harmless.
    */
  def typicalSpan(df: DataFrame, loCol: String, hiCol: String,
      quantile: Double = 0.5): Long = {
    import org.apache.spark.sql.functions.{col, expr}
    val row = df.filter(col(loCol) < col(hiCol))
      .agg(expr(
        s"percentile_approx($hiCol - $loCol, $quantile, 1000)").as("w"))
      .head()
    if (row.isNullAt(0)) 1L else math.max(1L, row.getLong(0))
  }

  /** Run `f` with a temporary shuffle-partition setting, restoring the
    * previous value afterwards (exception-safe).
    */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, prev)
  }
}
