package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedupe

/** A/B probe for the exact-substring dedup detection pass: the
  * key+count hash aggregation vs the shuffle+sort run-length scan
  * ([[Dedupe.duplicatedLongsSorted]]). Both produce identical results
  * (SubstrDedupSpec equality test); this measures which constant the
  * honest O(corpus) detection volume pays. Full-plan materialization,
  * same honesty rule as Bench.
  *
  * usage: SubstrProbe <sfDir> [runs=2]
  */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SubstrProbe <sfDir> [runs]")
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
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
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents")
    def time(sorted: Boolean): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      Dedupe.exactSubstrDedup(docs, "doc_id", "text", gramLen = 40,
        sortedDetection = sorted).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    time(true) // codegen warm-up, untimed
    val res = Seq("sorted" -> true, "hashagg" -> false).map {
      case (name, flag) =>
        val ts = (1 to runs).map(_ => time(flag))
        f""""$name":{"runs":${ts.map(t => f"$t%.2f").mkString("[", ",", "]")},"best":${ts.min}%.2f}"""
    }
    println(s"""{"metric":"substr_ab","sf":"$sfDir",${res.mkString(",")}}""")
    spark.stop()
  }
}
