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

  test("no query output schema contains array/map/struct columns") {
    // The driver's comparator sorts result rows by ALL columns with
    // pandas; an array cell raises "unhashable type: numpy.ndarray"
    // and the whole query is reported red with no values compared
    // (r15: q104/q106/q108). Nested types must never reach a
    // SparkEntry output — digest them (q107's xxhash64 pattern) or
    // unpivot to scalar rows (q104/q106/q108's posexplode pattern).
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    SparkEntry.queries.foreach { case (name, fn) =>
      val bad = fn(spark, sfDir).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => f.name
      }
      assert(bad.isEmpty,
        s"$name outputs nested-typed columns ${bad.mkString(",")} " +
          "— the driver's comparator cannot sort these")
    }
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
