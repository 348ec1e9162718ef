package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedupe, SignatureStore}

/** Write-volume evidence for the signature store's nightly commit
  * (r14 judge directive: prove appendBatch writes O(batch), and
  * confirm the band-file sizing trade at scale). Builds the corpus
  * store over (1 - 1/denom) of `documents`, then runs one nightly
  * pass (detection + appendBatch) over the remaining 1/denom batch,
  * and reports — from the filesystem, not the code's claims —
  * store bytes/files after the build vs bytes/files ADDED by the
  * night. A healthy delta layout has night_bytes tracking the batch
  * fraction (plus the labels snapshot, which is O(corpus ids) by
  * design) while corpus segments stay untouched.
  *
  * usage: StoreWriteProbe <sfDir> [denom=32]
  */
object StoreWriteProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StoreWriteProbe <sfDir> [denom]")
    val sfDir = args(0)
    val denom = if (args.length > 1) args(1).toInt else 32
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
    val (k, n, rpb, minJ) = (3, 16, 4, 0.5)
    val docs = Tables(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") % denom =!= (denom - 1))
    val batch = docs.filter(col("doc_id") % denom === (denom - 1))
    val store = java.nio.file.Files
      .createTempDirectory(s"graft_storewrite_$denom").toString
    def walk(sub: String): (Long, Long) = {
      // (bytes, data files) under <store>/<sub>, manifests included in
      // bytes but parquet part-files only in the file count
      var bytes = 0L; var files = 0L
      def rec(f: java.io.File): Unit =
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rec))
        else {
          bytes += f.length()
          if (f.getName.endsWith(".parquet")) files += 1
        }
      rec(new java.io.File(store, sub))
      (bytes, files)
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val buildSec = timed {
      SignatureStore.ensureCorpusState(spark, store, corpus,
        "doc_id", "text", k, n, rpb, minJ)
    }
    val (sigB0, sigF0) = walk("sigs")
    val (bandB0, bandF0) = walk("bands")
    val (labB0, _) = walk("labels")
    val corpusRows = corpus.count()
    val batchRows = batch.count()
    val nightSec = timed {
      spark.catalog.clearCache()
      val bands = SignatureStore.readBands(spark, store)
      val (_, labels) = SignatureStore.read(spark, store)
      val (merged, delta) = Dedupe.incrementalFromStoreWithDelta(
        bands, labels, batch, docs, "doc_id", "text", k, n, rpb, minJ)
      SignatureStore.appendBatch(spark, store,
        Dedupe.minhashWide(batch, "doc_id", "text", k, n,
          withCount = true), merged, n, rpb, labelDelta = Some(delta))
    }
    val (sigB1, sigF1) = walk("sigs")
    val (bandB1, bandF1) = walk("bands")
    val (labB1, _) = walk("labels")
    // night_label_bytes is the override DELTA segment (changed rows
    // only) plus its bytes-sized manifest — O(changed), not the
    // pre-r15 O(corpus) snapshot rewrite
    try {
      println(f"""{"metric":"store_write","sf":"$sfDir","denom":$denom,"corpus_rows":$corpusRows,"batch_rows":$batchRows,"build_sec":$buildSec%.2f,"corpus_sig_bytes":$sigB0,"corpus_band_bytes":$bandB0,"corpus_sig_files":$sigF0,"corpus_band_files":$bandF0,"night_sec":$nightSec%.2f,"night_sig_bytes":${sigB1 - sigB0},"night_band_bytes":${bandB1 - bandB0},"night_label_bytes":${labB1 - labB0},"night_sig_files":${sigF1 - sigF0},"night_band_files":${bandF1 - bandF0},"night_over_corpus_bytes":${(sigB1 - sigB0 + bandB1 - bandB0).toDouble / (sigB0 + bandB0)}%.4f,"batch_fraction":${batchRows.toDouble / (corpusRows + batchRows)}%.4f}""")
    } finally {
      def rm(f: java.io.File): Unit = if (f.exists()) {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(store))
    }
    spark.stop()
  }
}
