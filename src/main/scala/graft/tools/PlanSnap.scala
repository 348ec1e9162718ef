package graft.tools

import org.apache.spark.sql.SparkSession

/** Snapshot `.explain("formatted")` output for registered queries into
  * files — the before/after plan evidence an optimization round commits
  * under plans/rNN/. usage:
  *   PlanSnap <sfDir> <outDir> <suffix> <query> [query ...]
  * writes <outDir>/<query>_<suffix>.txt per query. Plans are built, not
  * executed (queries whose run() has side effects — store builds —
  * still pay those at plan-construction time).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanSnap <sfDir> <outDir> <suffix> <query> [query ...]")
    val Array(sfDir, outDir, suffix) = args.take(3)
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    args.drop(3).foreach { q =>
      spark.catalog.clearCache()
      org.apache.spark.sql.graftbridge.CheckpointBridge
        .releaseAllPersisted(spark)
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      // same string explain("formatted") prints
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"), txt)
      println(s"wrote $outDir/${q}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
