package graft.tools
import org.apache.spark.sql.SparkSession
object CountProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (dir, q) = (args(0), args(1))
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: $n rows in ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    for (i <- 1 to 3) {
      t(s"count      $i") { graft.SparkEntry.queries(q)(spark, dir).count() }
      t(s"toRdd.count$i") { graft.SparkEntry.queries(q)(spark, dir).queryExecution.toRdd.count() }
    }
    spark.stop()
  }
}
