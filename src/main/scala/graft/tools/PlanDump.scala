package graft.tools

import org.apache.spark.sql.SparkSession

/** Local diagnosis aid: print a registered query's formatted physical
  * plan (the `.explain("formatted")` loop of plan iteration) without
  * executing it. usage: PlanDump <sfDir> <query> [substring]
  * — with a substring, prints only matching plan lines plus a count.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query> [substring]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    val plan = df.queryExecution.executedPlan.toString
    args.lift(2) match {
      case Some(sub) =>
        val hits = plan.split("\n").filter(_.toLowerCase.contains(sub.toLowerCase))
        println(s"lines matching '$sub': ${hits.length}")
        hits.take(40).foreach(println)
      case None => println(plan)
    }
    spark.stop()
  }
}
