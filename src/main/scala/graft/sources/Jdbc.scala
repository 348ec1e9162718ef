package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S9 — JDBC relational source/sink (the reference's Postgres loader
  * boundary, `catalog/dags/common/sql.py:30-163`). The engine is
  * parquet-native; this is the compatibility path for deployments
  * whose catalog-of-record stays in a relational store.
  *
  * Scale notes (the knobs that matter at 100 TB, where the JDBC hop is
  * the bottleneck by construction):
  *  - an UNPARTITIONED jdbc read is ONE task pulling the whole table
  *    through one connection — [[readPartitioned]] splits on a numeric
  *    column into `numPartitions` concurrent range queries, which is
  *    the only way a big table transfer parallelizes;
  *  - Catalyst pushes filters and column pruning into the generated
  *    SQL (`PushedFilters` on the JDBCRelation scan), so the database
  *    does the selection, not the cluster;
  *  - `fetchsize` bounds driver-side row buffering per round trip;
  *  - writes partition-parallel too: each task opens its own
  *    connection and batches inserts (`batchsize`) — the target DB's
  *    ingest capacity, not Spark, is the limit.
  */
object Jdbc {

  /** Derby's embedded driver (on every Spark classpath — it backs the
    * Hive metastore), used for dockerless specs and smoke runs.
    */
  final val DerbyDriver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.ErrorIfExists,
      batchSize: Int = 1000): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .mode(mode)
      .save()

  /** Whole-table read — one connection, one task; only for small dims
    * (the popularity-constants-sized tables).
    */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .load()

  /** Range-partitioned parallel read: `numPartitions` concurrent
    * connections, each scanning one stride of `partitionColumn` in
    * [lower, upper]. Rows outside the bounds still return (first/last
    * partitions are unbounded) — bounds shape parallelism, not
    * filtering.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int, fetchSize: Int = 1000): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .option("fetchsize", fetchSize)
      .load()
}
