package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Diagnoses the SRP pair-generation plan on a given dir: prints the
  * formatted physical plan and the timed wall for the found-pair pass
  * at rowsPerBand=4. Motivated by an r14 probe observation: the SAME
  * 20k-vector corpus ran 52s when filtered out of the sf10 table but
  * 294-378s when read as the whole sf1 table — a plan-shape, not a
  * data, difference. usage: SrpPlanProbe <sfDir> [pairCap=20000]
  */
object SrpPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cap = if (args.length > 1) args(1).toLong else 20000L
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
    val corpus = Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") < cap)
    val found = Similarity.srpNearDupPairs(corpus, "vec_id", "embedding",
      Similarity.srpSigns(64, 64), rowsPerBand = 4, threshold = 0.35)
    val t0 = System.nanoTime()
    val n = found.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(found.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    println(f"""{"metric":"srp_plan","sf":"$sfDir","pairs":$n,"sec":$sec%.2f}""")
    spark.stop()
  }
}
