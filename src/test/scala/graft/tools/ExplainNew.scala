package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("q57_e2e_funnel", "q58_license_backfill")) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      val p = df.queryExecution.executedPlan.toString
      println(s"== $q")
      println("  BroadcastHashJoin: " + "BroadcastHashJoin".r.findAllIn(p).size)
      println("  SortMergeJoin: " + "SortMergeJoin".r.findAllIn(p).size)
      println("  Exchange: " + "Exchange hashpartitioning".r.findAllIn(p).size)
      println("  CartesianProduct: " + "CartesianProduct".r.findAllIn(p).size)
      println("  BroadcastNestedLoop: " + "BroadcastNestedLoopJoin".r.findAllIn(p).size)
    }
    spark.stop()
  }
}
