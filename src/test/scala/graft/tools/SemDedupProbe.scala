package graft.tools
import org.apache.spark.sql.SparkSession
/** Scale probe: semDedup wall time as the cluster count scales with the
  * corpus (the at-scale configuration) vs the fixed oracle k.
  * usage: SemDedupProbe <sfDir> <k> [iters]
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (dir, k) = (args(0), args(1).toInt)
    val iters = args.lift(2).map(_.toInt).getOrElse(2)
    val t0 = System.nanoTime()
    val n = graft.operators.Similarity.semDedup(
      graft.Tables(spark, dir, "embeddings"), "vec_id", "embedding",
      k = k, iters = iters, threshold = 0.35, dim = 64, maxBlock = 256)
      .queryExecution.toRdd.count()
    println(f"semDedup k=$k iters=$iters: $n rows in ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
