package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * At 100 TB the dominant read cost is scan volume, and scan volume is
  * governed by file-level min/max pruning. A table range-partitioned on
  * ONE key prunes only on that key; interleaving the bits of TWO keys
  * into a Z-value and range-partitioning on it keeps files tight in
  * BOTH dimensions, so predicates on either key (or both) skip most
  * files — the standard Delta/Iceberg OPTIMIZE ZORDER layout, here as a
  * plain column expression + `repartitionByRange` write.
  *
  * The bit-spreading steps below are the single source of truth: the
  * same (shift, mask) sequence renders to a Spark `Column` tree and to
  * DuckDB SQL text (`spreadSql`), so the oracle computes bit-identical
  * Z-values.
  */
object Layout {

  /** Classic 16→32-bit Morton spread: after masking to 16 bits, each
    * (shift, mask) step doubles the gap between occupied bit positions.
    */
  private val spreadSteps: Seq[(Int, Long)] = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Bits of (x & 0xFFFF) spread to even positions of a 32-bit value. */
  def spread(x: Column): Column =
    spreadSteps.foldLeft(x.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (c, (s, m)) => shiftleft(c, s).bitwiseOR(c).bitwiseAND(lit(m))
    }

  /** The same spread as DuckDB SQL text (for oracle parity). */
  def spreadSql(e: String): String =
    spreadSteps.foldLeft(s"(CAST($e AS BIGINT) & 65535)") {
      case (c, (s, m)) => s"((($c << $s) | $c) & $m)"
    }

  /** 32-bit Z-value interleaving two 16-bit keys: x on even bits, y on
    * odd bits.
    */
  def zValue(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** DuckDB SQL for [[zValue]]. */
  def zValueSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Rows with their Z-value and a fixed-width Z-range bucket (top
    * `bucketBits` bits of the 32-bit Z-space). The bucket is the file /
    * partition assignment a layout rewrite would use: because the
    * Z-curve is contiguous within a bucket, each bucket's rows span at
    * most a 2^(8-bucketBits/2)-wide slab in each dimension — that bound
    * is what makes min/max pruning effective on both keys.
    */
  def zOrdered(df: DataFrame, x: Column, y: Column, bucketBits: Int)
      : DataFrame =
    df.withColumn("z", zValue(x, y))
      .withColumn("z_bucket", shiftright(col("z"), 32 - bucketBits))

  /** The layout rewrite itself: cluster files by Z-range. One range
    * shuffle (sampled range boundaries, so buckets are
    * occupancy-balanced even when the key distribution is skewed — the
    * fixed-width `z_bucket` is the pruning METADATA, the range
    * partitioner is the data placement), files internally sorted so
    * column chunk min/max stats stay tight.
    */
  def writeZordered(df: DataFrame, x: Column, y: Column, numFiles: Int,
      path: String): Unit =
    df.withColumn("z", zValue(x, y))
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(path)
}
