package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Watermark semantics: events later than the horizon are dropped from
  * the streaming aggregation (ST-semantics: lateness beyond the
  * reingestion horizon is not merged).
  */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000000L // one hour in ns

  private def writeBatch(dir: String, tsNs: Seq[Long]): Unit =
    tsNs.zipWithIndex.map { case (ts, i) =>
      (i.toLong, ts, 1L, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)

  test("append-mode windows finalize; beyond-watermark events drop") {
    val landing = java.nio.file.Files.createTempDirectory("wm").toString
    val day = 1700006400L * 1000000000L // a midnight, in ns
    // batch 1: two events in hour 0, one in each of hours 1..4
    writeBatch(landing, Seq(day + 1, day + 2, day + H + 1,
      day + 2 * H + 1, day + 3 * H + 1, day + 4 * H + 1))
    val agg = EventStreams.hourlyCounts(
      EventStreams.readEvents(spark, landing), watermark = "10 minutes")
    val q = agg.writeStream
      .outputMode("append")          // emit only FINALIZED windows
      .format("memory").queryName("wm_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("wmchk").toString)
      .start()
    q.processAllAvailable()
    // batch 2: a fresh event (hour 5), an in-horizon late event (hour 4),
    // and an ancient one (two days earlier — beyond the watermark)
    writeBatch(landing, Seq(day + 5 * H + 1, day + 4 * H + 2,
      day - 48 * H))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_out")
      .select(col("hour").cast("long").as("h"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val daySec = day / 1000000000L
    // hours 0..3 finalized by the batch-2 watermark (04:00:01 - 10min)
    assert(out.keySet == Set(daySec, daySec + 3600, daySec + 7200,
      daySec + 10800))
    assert(out(daySec) == 2)
    // the ancient event's window (day - 48h) was never emitted NOR
    // merged — dropped by the watermark
    assert(!out.contains(daySec - 48 * 3600))
  }

  test("incremental max cache merges per batch into the versioned table") {
    import graft.sources.VersionedTable
    val landing = java.nio.file.Files.createTempDirectory("mc").toString
    val root = java.nio.file.Files.createTempDirectory("mcroot").toString
    val chk = java.nio.file.Files.createTempDirectory("mcchk").toString
    val day = 1700006400L * 1000000000L
    Seq((1L, day + 1, 1L, "view", 5.0, "{}"),
        (2L, day + 2, 1L, "click", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(landing)
    val q = EventStreams.incrementalMaxCache(
      EventStreams.readEvents(spark, landing), "event_type", "value",
      root, chk)
    q.processAllAvailable()
    // batch 2: a higher view max, a lower click value, a new type
    Seq((3L, day + 3, 1L, "view", 7.0, "{}"),
        (4L, day + 4, 1L, "click", 2.0, "{}"),
        (5L, day + 5, 1L, "save", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(landing)
    q.processAllAvailable()
    q.stop()
    val got = VersionedTable.read(spark, root)
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // view max raised, click max kept (greatest semantics), save added
    assert(got == Seq(("click", 9.0), ("save", 1.0), ("view", 7.0)))
    assert(VersionedTable.currentVersion(spark, root).exists(_ >= 2L))
  }

  test("streaming dedup keeps first occurrence within the horizon") {
    val landing = java.nio.file.Files.createTempDirectory("dd").toString
    val day = 1700006400L * 1000000000L
    // same event_id=7 occurs twice in-batch, once again next batch
    Seq((7L, day + 1, 1L, "view", 1.0, "{}"),
        (7L, day + 2, 1L, "view", 1.0, "{}"),
        (8L, day + 3, 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(landing)
    val dedup = EventStreams.dedupWithinHorizon(
      EventStreams.readEvents(spark, landing), Seq("event_id"),
      watermark = "1 hour")
    val q = dedup.writeStream
      .outputMode("append").format("memory").queryName("dd_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ddchk").toString)
      .start()
    q.processAllAvailable()
    Seq((7L, day + 4, 1L, "view", 1.0, "{}"),   // dupe inside horizon
        (9L, day + 5, 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(landing)
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dd_out").select("event_id")
      .as[Long].collect().toSeq.sorted
    assert(ids == Seq(7L, 8L, 9L)) // each key once, first wins
  }

  test("horizon-bounded LSH: in-horizon pairs match, old state evicts") {
    import org.apache.spark.sql.types._
    val landing = java.nio.file.Files.createTempDirectory("lshh").toString
    val dupText = "x1 x2 x3 x4 x5 x6 x7 x8"
    val t0 = 1700006400000L // ms
    val hourMs = 3600L * 1000
    def write(rows: Seq[(Long, String, Long)]): Unit =
      rows.map { case (id, txt, ms) =>
        (id, txt, new java.sql.Timestamp(ms))
      }.toDF("doc_id", "text", "ts")
        .coalesce(1).write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("ts", TimestampType)))
    val stream = EventStreams.streamingBandCandidatesWithHorizon(
      spark.readStream.schema(schema).parquet(landing),
      "doc_id", "text", "ts", shingleK = 3, numHashes = 16,
      rowsPerBand = 4, horizonMs = hourMs)
    val q = stream.writeStream
      .outputMode("append").format("memory").queryName("lshh_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("lshhchk").toString)
      .start()
    // b1: dup pair at t0, plus an unrelated doc
    write(Seq((1L, dupText, t0), (2L, dupText, t0 + 1),
      (3L, "p1 p2 p3 p4 p5 p6 p7 p8", t0 + 2)))
    q.processAllAvailable()
    // b2: unrelated doc 2h later — advances the watermark past t0+1h
    write(Seq((4L, "q1 q2 q3 q4 q5 q6 q7 q8", t0 + 2 * hourMs)))
    q.processAllAvailable()
    // b3: two fresh dups of the SAME text as b1, beyond the horizon —
    // docs 1,2 must be evicted, so only (5,6) pairs; doc 3's quiet
    // buckets time out wholesale in this batch
    write(Seq((5L, dupText, t0 + 2 * hourMs + 1000),
      (6L, dupText, t0 + 2 * hourMs + 2000)))
    q.processAllAvailable()
    val pairs = spark.table("lshh_out").select("doc_a", "doc_b")
      .distinct().as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (5L, 6L)))
    // state is bounded by the horizon: only docs 4, 5, 6 may remain
    // (≤ 3 docs × 4 bands of buckets; without eviction docs 1-3 would
    // hold 8 more groups)
    val stateRows = q.recentProgress
      .filter(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum).lastOption
    q.stop()
    assert(stateRows.exists(_ <= 12), s"state not bounded: $stateRows")
  }

  test("streaming LSH candidates equal the batch pair set across batches") {
    import graft.operators.Dedupe
    import org.apache.spark.sql.types._
    val landing = java.nio.file.Files.createTempDirectory("lsh").toString
    val dupText = "x1 x2 x3 x4 x5 x6 x7 x8"
    val batch1 = Seq((1L, dupText), (2L, dupText),
      (3L, "p1 p2 p3 p4 p5 p6 p7 p8"))
    val batch2 = Seq((4L, dupText),                 // cross-batch dup of 1,2
      (5L, "q1 q2 q3 q4 q5 q6 q7 q8"))
    batch1.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(landing)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = EventStreams.streamingBandCandidates(
      spark.readStream.schema(schema).parquet(landing),
      "doc_id", "text", shingleK = 3, numHashes = 16, rowsPerBand = 4)
    val q = stream.writeStream
      .outputMode("append").format("memory").queryName("lsh_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("lshchk").toString)
      .start()
    q.processAllAvailable()
    val afterB1 = spark.table("lsh_out").select("doc_a", "doc_b")
      .distinct().as[(Long, Long)].collect().toSet
    assert(afterB1 == Set((1L, 2L)))                // in-batch pair only
    batch2.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(landing)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("lsh_out").select("doc_a", "doc_b")
      .distinct().as[(Long, Long)].collect().toSet
    // the state found doc 4's dups from the EARLIER batch
    val batchPairs = Dedupe.minhashCandidates(
        Dedupe.minhashWide((batch1 ++ batch2).toDF("doc_id", "text"),
          "doc_id", "text", 3, 16), 16, 4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(streamed == batchPairs &&
      streamed == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    spark.catalog.clearCache()
  }
}
