package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedupe, SignatureStore}
import graft.sources.SegmentedTable

/** The nightly near-dup maintenance loop (q79/q80) as a Structured
  * Streaming sink: each micro-batch of documents is signed ONCE,
  * banded against the PERSISTED corpus band index, verified, contracted
  * into the persisted cluster labels, and committed as O(batch) delta
  * segments — so a continuously-arriving corpus keeps an up-to-date
  * near-dup clustering without any per-batch corpus re-scan. This is
  * the streaming composition of the reference's pull-ingest →
  * upsert-to-catalog cadence (`provider_dag_factory.py` schedules it
  * nightly; `sql.py:264-332` keeps the write O(batch)) with the LSH
  * store replacing the Postgres upsert target.
  *
  * Exactly-once: `foreachBatch` re-delivers a micro-batch after a
  * crash, so every table commit is tagged with the batch id
  * ([[SegmentedTable.appendSegment]] tag → segment-name suffix). A
  * replay finds the tables that already committed its tag and skips
  * them, completing only what the crash interrupted; the labels
  * snapshot re-commit is idempotent by value. State lands effectively
  * exactly once without a cross-table transaction.
  *
  * Scale: per micro-batch cost is O(batch + true collisions) — the
  * candidate pass semi-joins the corpus band table against the batch's
  * band keys before any exchange ([[Dedupe.incrementalFromStore]]), and
  * the sig/band/doc commits write only batch-sized segments. The
  * doc-text corpus (needed to verify batch-vs-corpus candidate pairs)
  * rides its own [[SegmentedTable]], appended with the same tag
  * discipline. Labels commit as merge-on-read override deltas — only
  * the rows tonight's batch actually changed — so NO per-fold write
  * scales with corpus; run [[SignatureStore.compact]] on a maintenance
  * cadence to fold the accumulated deltas into the base.
  */
object StreamingDedupe {

  /** Fold one micro-batch into the persisted state; returns false when
    * the batch was already fully committed (pure replay). First batch
    * bootstraps the store (the batch IS the corpus).
    *
    * Replay correctness hinges on ONE ordering rule: the doc-table
    * segment (tagged with the batch id) commits LAST, so its tag is
    * the authoritative "batch fully folded" marker. Every earlier step
    * is individually idempotent on replay — store build is guarded by
    * existence, tagged sig/band appends skip themselves, the labels
    * snapshot re-commits by value — so a crash anywhere leaves a state
    * the retry completes without duplicating rows.
    */
  def foldBatch(spark: SparkSession, storeRoot: String, docsRoot: String,
      batch: DataFrame, batchId: Long, idCol: String, textCol: String,
      shingleK: Int, numHashes: Int, rowsPerBand: Int,
      minJaccard: Double): Boolean = {
    val tag = s"b$batchId"
    val docsBatch = batch.select(col(idCol), col(textCol))
    val docsReady =
      SegmentedTable.currentVersion(spark, docsRoot).isDefined
    if (docsReady && SegmentedTable.hasTag(spark, docsRoot, tag))
      return false // fully committed before a crash — pure replay
    if (!SignatureStore.exists(spark, storeRoot)) {
      // bootstrap: the first batch IS the corpus
      SignatureStore.build(spark, storeRoot, docsBatch, idCol, textCol,
        shingleK, numHashes, rowsPerBand, minJaccard)
    } else if (docsReady) {
      val corpusDocs = SegmentedTable.read(spark, docsRoot)
        .select(col(idCol), col(textCol))
      // text lookup must cover both candidate sides: corpus docs (from
      // the persisted doc table) and this batch's docs. Plain union, no
      // distinct: the committed doc table can never contain this batch
      // (its commit is LAST and tag-guarded above), and a corpus-wide
      // dedup shuffle per micro-batch would violate the O(batch) loop.
      // foldNight signs the batch once (shared between candidates and
      // the segment commit) and overlaps the three segment writes.
      SignatureStore.foldNight(spark, storeRoot, docsBatch,
        corpusDocs.unionByName(docsBatch), idCol, textCol,
        shingleK, numHashes, rowsPerBand, minJaccard, tag = Some(tag))
    }
    // else: store exists but the doc table was never committed — an
    // interrupted bootstrap; the doc commit below completes it
    SegmentedTable.appendSegment(docsBatch, docsRoot, Some(tag))
    true
  }

  /** Start the maintenance stream: `docsStream` (streaming frame with
    * `idCol`/`textCol`) folds into the store per micro-batch.
    */
  def run(docsStream: DataFrame, storeRoot: String, docsRoot: String,
      checkpoint: String, idCol: String = "doc_id",
      textCol: String = "text", shingleK: Int = 3, numHashes: Int = 16,
      rowsPerBand: Int = 4, minJaccard: Double = 0.5): StreamingQuery =
    docsStream.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        foldBatch(b.sparkSession, storeRoot, docsRoot, b, id,
          idCol, textCol, shingleK, numHashes, rowsPerBand, minJaccard)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
