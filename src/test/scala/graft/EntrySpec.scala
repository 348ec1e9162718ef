package graft

import graft.streaming.EventStreams

/** Smoke tests for the driver contract + streaming parity. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs on sf0.001 and every oracle key exists") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n >= 0, s"$name failed")
    }
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("streaming hourly counts match the batch aggregation") {
    // the file stream source wants a directory (landing zone analog)
    val landing = java.nio.file.Files.createTempDirectory("events_landing")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      landing.resolve("events.parquet"))
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.hourlyCounts(
        EventStreams.readEvents(spark, landing.toString)),
      "hourly_test")
    import org.apache.spark.sql.functions.{col, date_trunc}
    val batch = Tables(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")), col("event_type"))
      .count()
    assert(streamed.count() == batch.count())
  }
}
