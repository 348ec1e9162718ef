package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches over Spark's built-in Apache
  * DataSketches HLL functions — the incremental form a 100 TB pipeline
  * needs: per-partition/per-batch sketches are tiny binary columns
  * that UNION exactly (register-wise max, order-independent), so a
  * nightly snapshot merges into a running total without ever
  * re-scanning history. Estimates are deterministic for a given input
  * set, but engine-specific — so this surface is spec-verified against
  * exact counts (error bound + merge identity) rather than the DuckDB
  * oracle.
  */
object Sketches {

  /** Per-group HLL sketch of `valueCol` (binary, mergeable). */
  def distinctSketch(df: DataFrame, groupCols: Seq[String],
      valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Merge sketch batches group-wise (register-max union). */
  def mergeSketches(batches: DataFrame, groupCols: Seq[String])
      : DataFrame =
    batches.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Sketch + estimate in one pass (the q-surface shape). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    distinctSketch(df, groupCols, valueCol)
      .select(groupCols.map(col) :+
        estimate(col("sketch")).cast("long").as("approx_distinct"): _*)

  /** KMV (bottom-k) distinct estimate per group — the sketch whose
    * estimate IS portable SQL ("the k smallest md5 values"), so unlike
    * the HLL path this one is oracle-checkable bit-for-bit (q76). Same
    * mergeable partial-aggregation shape as HLL: each partition
    * exchanges at most k longs per group. See
    * [[graft.functions.KmvSketchAgg]].
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Int = 64): DataFrame = {
    graft.functions.KmvSketchAgg.register(df.sparkSession)
    df.select(groupCols.map(col) :+
        graft.functions.KmvSketchAgg.hash60(col(valueCol)).as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(expr(s"kmv_distinct(__h, $k)").as("est_distinct"))
  }
}
