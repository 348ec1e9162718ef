package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release the block-manager blocks behind a `localCheckpoint()`ed
  * DataFrame. `spark.catalog.clearCache()` does NOT free these — they
  * are RDD persistence (the checkpoint's MEMORY_AND_DISK blocks), not
  * SQL cache entries — so iterative algorithms that checkpoint per
  * round (e.g. connected components) would otherwise accumulate one
  * frame's worth of blocks per iteration for the life of the session.
  * Lives under org.apache.spark.sql.* for `private[sql]` access to the
  * plan internals (same pattern as [[ColumnBridge]]).
  */
object CheckpointBridge {
  /** Unpersist the checkpointed RDD under `df` (no-op for plans that
    * are not checkpoint scans). Non-blocking.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
