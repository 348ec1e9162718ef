package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedupe, SignatureStore}
import graft.sources.SegmentedTable
import graft.streaming.StreamingDedupe

/** The nightly near-dup loop as a streaming sink: micro-batches fold
  * into the persisted store exactly once, and the folded state equals
  * a from-scratch clustering of everything seen — the q80 invariant,
  * driven through Structured Streaming's re-delivery semantics.
  */
class StreamingDedupeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  test("micro-batches fold exactly-once and converge to the " +
      "from-scratch clustering; crash-window replays do not duplicate") {
    val docs = Tables(spark, sfDir, "documents")
      .select("doc_id", "text")
    val landing = tmp("sdl_land")
    val storeRoot = tmp("sdl_store")
    val docsRoot = tmp("sdl_docs") + "/t" // nonexistent leaf dir
    val chk = tmp("sdl_chk")
    def writeBatch(m: Int): Unit =
      docs.filter(col("doc_id") % 3 === m)
        .coalesce(1).write.mode("append").parquet(landing)
    writeBatch(0)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    val q = StreamingDedupe.run(stream, storeRoot, docsRoot, chk)
    try {
      q.processAllAvailable()
      writeBatch(1); q.processAllAvailable()
      writeBatch(2); q.processAllAvailable()
    } finally q.stop()
    // the persisted doc corpus holds every doc EXACTLY once
    val gotDocs = SegmentedTable.read(spark, docsRoot)
    assert(gotDocs.count() == docs.count())
    assert(gotDocs.exceptAll(docs).isEmpty &&
      docs.exceptAll(gotDocs).isEmpty)
    // folded labels == from-scratch store build over all docs (the
    // q80 invariant, now across streaming commits)
    val refStore = tmp("sdl_ref")
    SignatureStore.build(spark, refStore, docs, "doc_id", "text",
      3, 16, 4, 0.5)
    val (_, refLabels) = SignatureStore.read(spark, refStore)
    val (_, gotLabels) = SignatureStore.read(spark, storeRoot)
    assert(gotLabels.exceptAll(refLabels).isEmpty &&
      refLabels.exceptAll(gotLabels).isEmpty)

    // pure replay: foreachBatch re-delivers batch 2 after a crash —
    // the docs-table tag (committed last) marks it done, nothing moves
    val sigsRoot = SignatureStore.sigsRoot(storeRoot)
    val sigV = SegmentedTable.currentVersion(spark, sigsRoot)
    val folded = StreamingDedupe.foldBatch(spark, storeRoot, docsRoot,
      docs.filter(col("doc_id") % 3 === 2), batchId = 2,
      "doc_id", "text", 3, 16, 4, 0.5)
    assert(!folded)
    assert(SegmentedTable.currentVersion(spark, sigsRoot) == sigV)
    assert(SegmentedTable.read(spark, docsRoot).count() == docs.count())

    // crash-window replay: signatures/bands/labels committed but the
    // crash hit BEFORE the docs-table commit. The retry must complete
    // the batch without duplicating the already-committed rows.
    val batch9 = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val bands = SignatureStore.readBands(spark, storeRoot)
    val (_, labels) = SignatureStore.read(spark, storeRoot)
    val corpusDocs = SegmentedTable.read(spark, docsRoot)
    val merged = Dedupe.incrementalFromStore(bands, labels, batch9,
      corpusDocs.unionByName(batch9).distinct(), "doc_id", "text",
      3, 16, 4, 0.5)
    SignatureStore.appendBatch(spark, storeRoot,
      Dedupe.minhashWide(batch9, "doc_id", "text", 3, 16,
        withCount = true), merged, 16, 4, tag = Some("b9"))
    // "crash" here — docs segment never committed; now the retry runs
    val sigRowsAfterCrash = SignatureStore.read(spark, storeRoot)._1.count()
    val refolded = StreamingDedupe.foldBatch(spark, storeRoot, docsRoot,
      batch9, batchId = 9, "doc_id", "text", 3, 16, 4, 0.5)
    assert(refolded)
    // tagged sig append skipped itself: no duplicated signature rows
    assert(SignatureStore.read(spark, storeRoot)._1.count()
      == sigRowsAfterCrash)
    // the doc table completed, exactly once
    val finalDocs = SegmentedTable.read(spark, docsRoot)
    assert(finalDocs.count() == docs.count() + batch9.count())
    // and the labels cover the late batch's nodes
    val (_, finalLabels) = SignatureStore.read(spark, storeRoot)
    assert(finalLabels.filter(col("node") >= 1000000L).count()
      == batch9.count())
  }
}
