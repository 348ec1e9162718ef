package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Local diagnosis aid: run one registered query and print every Spark
  * job's wall time + description, so scheduling-floor overhead (many
  * small jobs) is distinguishable from data-bound cost in a profile.
  * Not part of the engine; invoked by hand during plan iteration.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: JobProfile <sfDir> <query> [query ...] [reps]")
    val sfDir = args(0)
    val reps = scala.util.Try(args.last.toInt).getOrElse(2)
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .map(_.getProperty("spark.job.description", "")).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          val dt = (System.nanoTime() - t0) / 1e9
          lines.add(f"job ${je.jobId}%3d ${dt}%7.3fs  ${desc.take(90)}")
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield (a - b) / 1e3).getOrElse(-1.0)
        val tm = si.taskMetrics
        lines.add(f"  stage ${si.stageId}%3d ${wall}%7.3fs tasks=${si.numTasks}%4d " +
          f"cpu=${tm.executorCpuTime / 1e9}%6.2fs run=${tm.executorRunTime / 1e3}%6.2fs " +
          f"gc=${tm.jvmGCTime / 1e3}%5.2fs in=${tm.inputMetrics.recordsRead}%9d " +
          f"sw=${tm.shuffleWriteMetrics.recordsWritten}%9d " +
          f"swB=${tm.shuffleWriteMetrics.bytesWritten}%11d  ${si.name.take(40)}")
      }
    })
    // interleaved A/B when several queries are named (args 1..n-1 with
    // the last arg numeric = reps): alternation cancels slow machine
    // drift that back-to-back blocks fold entirely into one query
    val queries =
      if (scala.util.Try(args.last.toInt).isSuccess)
        args.drop(1).dropRight(1).toSeq
      else args.drop(1).toSeq
    val detail = sys.env.get("JOBPROFILE_DETAIL").isDefined
    for (rep <- 1 to reps; q <- queries) {
      val fn = graft.SparkEntry.queries(q)
      spark.catalog.clearCache()
      lines.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      println(s"== $q rep $rep: rows=$n wall=${f"$dt%.3f"}s")
      if (detail) lines.forEach(l => println("  " + l))
    }
    spark.stop()
  }
}
