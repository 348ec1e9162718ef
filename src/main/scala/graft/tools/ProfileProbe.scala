package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.Profile

/** Local A/B probe for the q90 profile operator (r17 judge directive
  * #7): exact single-scan Expand distinct-aggregate
  * ([[graft.operators.Profile.table]]) vs the KMV-sketch swap
  * ([[graft.operators.Profile.tableApprox]]) documented as the 100 TB
  * alternative. Times both over the same columns with the noop-style
  * toRdd materialization the bench uses, and prints the estimates
  * next to the exact counts so the accuracy trade is visible in the
  * same artifact. Not part of the engine; invoked by hand.
  * usage: ProfileProbe <sfDir> [reps]
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileProbe <sfDir> [reps]")
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "64m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority", "o_orderdate")
    def orders = Tables(spark, sfDir, "orders")
    def time(label: String, f: => DataFrame): Unit =
      (1 to reps).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f.queryExecution.toRdd.count()
        println(f"$label run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    // warm-up (codegen, parquet footers)
    orders.count()
    time("exact_expand   ", Profile.table(orders, cols))
    time("kmv_k1024      ", Profile.tableApprox(orders, cols, 1024))
    time("kmv_k4096      ", Profile.tableApprox(orders, cols, 4096))
    println("— accuracy (exact vs kmv_k1024 n_distinct) —")
    val exact = Profile.table(orders, cols).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    Profile.tableApprox(orders, cols, 1024).collect().foreach { r =>
      val (c, est) = (r.getString(0), r.getLong(3))
      val ex = exact(c)
      println(f"$c%-16s exact=$ex%8d kmv=$est%8d err=${
        if (ex == 0) 0.0 else 100.0 * (est - ex).abs / ex}%.2f%%")
    }
    spark.stop()
  }
}
