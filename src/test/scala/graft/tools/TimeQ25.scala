package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ25 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    for (qn <- Seq("q26_simhash")) {
      val fn = graft.SparkEntry.queries(qn)
      (1 to 4).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"$qn run$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
