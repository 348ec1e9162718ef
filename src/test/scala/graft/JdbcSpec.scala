package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.Jdbc

/** S9 smoke path: a real `format("jdbc")` round trip against embedded
  * Derby (in-memory, dockerless — the driver ships on every Spark
  * classpath). Covers write, whole read, range-partitioned parallel
  * read, and filter pushdown into the generated SQL.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("jdbc: write, read back, partitioned read, filter pushdown") {
    val df = (1L to 100L).map(i => (i, s"name$i", i * 10))
      .toDF("id", "name", "score")
    Jdbc.write(df, url, "people", SaveMode.Overwrite)

    // whole read round-trips values
    val back = Jdbc.read(spark, url, "people")
    assert(back.count() == 100)
    assert(back.agg(sum("score")).as[Long].head() == (1L to 100L).map(_ * 10).sum)

    // partitioned read: 4 concurrent range scans, same data
    val part = Jdbc.readPartitioned(spark, url, "people", "id",
      lower = 1, upper = 100, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
    // bounds shape parallelism, not filtering: out-of-range rows survive
    Jdbc.write(Seq((999L, "straggler", 0L)).toDF("id", "name", "score"),
      url, "people", SaveMode.Append)
    assert(Jdbc.readPartitioned(spark, url, "people", "id", 1, 100, 4)
      .count() == 101)

    // predicate pushdown reaches the JDBC scan (DB does the filtering)
    val filtered = back.filter(col("score") > 500).select("id")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("score"), plan)
    assert(filtered.count() == 50)
  }
}
