package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall seconds. `count()` forces the
  * full plan; each query is timed after a warm session is up (JVM + Spark
  * startup excluded, first-query codegen included).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (FileSystem init, codegen compiler) outside timing
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    // Three timed runs per query, MEDIAN reported — best-of-N hides
    // nothing but rewards lucky runs, and a single run is exposed to
    // GC/system noise (the r3 artifact swung individual queries 20×).
    // Per-run times are emitted alongside the median so noise is
    // visible in the artifact itself.
    val runsPerQuery = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runsPerQuery).map { _ =>
        // clear persisted frames BEFORE timing (no run may hit a cache
        // left by a previous run of the same query)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"BENCH FAILURE $name: $e")
            errors(name) = e.toString.replaceAll("[\"\\\\\n]", " ").take(160)
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // ... and AFTER: a query that persist()ed mid-plan must not hold
        // executor memory while the next query runs
        spark.catalog.clearCache()
        dt
      }
      name -> times
    }
    def median(ts: Seq[Double]): Double = ts.sorted.apply(ts.size / 2)
    val qs = results.map { case (k, ts) => "\"" + k + f"\":${median(ts)}%.3f" }
      .mkString("{", ",", "}")
    val runsJson = results.map { case (k, ts) =>
      "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map { case (_, ts) => median(ts) }.sum
    // per-run detail goes on its OWN line, printed FIRST: the driver's
    // tail capture must never truncate the summary line (BENCH_r04 lost
    // `total` and q01-q08 when `runs` tripled the single line's length)
    println(f"""{"metric":"runs","runs":$runsJson}""")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    if (errors.nonEmpty) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}
