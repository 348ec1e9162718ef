package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainQ25 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, "/root/testdata/sf0.01", "documents")
    import graft.operators.Dedupe
    val shAll = Dedupe.shingleRowsAll(docs, "doc_id", "text", 3)
    val sig = Dedupe.minhashWideFromShingles(shAll, 16)
    val cand = Dedupe.minhashCandidates(sig, 16, 4)
    cand.count()
    val plan = cand.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE_COUNT=" + "ReusedExchange".r.findAllIn(plan).size)
    println("HASHAGG_COUNT=" + "HashAggregate".r.findAllIn(plan).size)
    println("SCAN_COUNT=" + "Scan parquet".r.findAllIn(plan).size)
    spark.stop()
  }
}
