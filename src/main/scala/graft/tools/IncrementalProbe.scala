package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedupe, SignatureStore}

/** Batch-fraction sweep for the incremental clustering pipeline: for
  * each fraction f, build the corpus store over (1-f) of `documents`
  * (UNTIMED — that is the amortized corpus-version cost), then time the
  * NIGHTLY path (sign only the batch, candidates vs persisted
  * signatures, verify, label contraction) against the from-scratch
  * clustering of the full table. Prints one JSON line per fraction.
  *
  * Motivation (r13): q79's bench split is batch = 50% of the corpus —
  * deliberately adversarial, but it makes incremental ≈ from-scratch at
  * large SF because exact-verify work (shared by both paths) dominates
  * over the signing the store avoids. A real nightly batch is a few
  * percent of the corpus; this probe measures how the incremental win
  * scales with corpus/batch, which SCALING.md cites.
  *
  * usage: IncrementalProbe <sfDir> [fractionDenominators...=2,8,32]
  */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IncrementalProbe <sfDir> [denoms]")
    val sfDir = args(0)
    val denoms = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(2, 8, 32)
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
    def timeIt[A](f: => A): Double = {
      // cache hygiene: without this, run N's eager persists are logical-
      // plan-identical to run N-1's and the cache manager serves them,
      // silently turning repeated timings into cache reads (the same
      // clearCache the bench harness does between runs)
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = Tables(spark, sfDir, "documents")
    // from-scratch baseline (q59's plan), median of 3
    def scratch(): Double = timeIt {
      val sig = Dedupe.minhashWide(docs, "doc_id", "text", k, n,
        withCount = true)
      val cand = graft.core.CacheHandle.eager(
        graft.core.CacheHandle.session.track(
          Dedupe.minhashCandidatePairs(sig, n, rpb, minSizeRatio = minJ)
            .persist()))
      Dedupe.connectedComponents(
        Dedupe.verifyJaccardOneJoin(cand, docs, "doc_id", "text", k, minJ),
        "doc_a", "doc_b", distinctEdges = true)
        .queryExecution.toRdd.count() // full materialization (no count-pruning)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    scratch() // warm-up
    val base = median((1 to 3).map(_ => scratch()))
    val results = denoms.map { d =>
      val corpus = docs.filter(col("doc_id") % d =!= (d - 1))
      val batch = docs.filter(col("doc_id") % d === (d - 1))
      val store = java.nio.file.Files
        .createTempDirectory(s"graft_incprobe_$d").toString
      val (bands, labels) = SignatureStore.ensureCorpusState(spark, store,
        corpus, "doc_id", "text", k, n, rpb, minJ) // untimed build
      def nightly(): Double = timeIt {
        Dedupe.incrementalFromStore(bands, labels, batch, docs,
          "doc_id", "text", k, n, rpb, minJ)
          .queryExecution.toRdd.count() // full materialization
      }
      nightly() // warm-up
      val t = median((1 to 3).map(_ => nightly()))
      (d, t)
    }
    // empty-batch floor: the nightly cost that does not shrink with the
    // batch — store scans, label rewrite, full-label output, fixed
    // per-job overheads
    val floorT = {
      val corpus = docs
      val store = java.nio.file.Files
        .createTempDirectory("graft_incprobe_floor").toString
      val (bands, labels) = SignatureStore.ensureCorpusState(spark, store,
        corpus, "doc_id", "text", k, n, rpb, minJ)
      val emptyBatch = docs.filter(lit(false))
      def night(): Double = timeIt {
        Dedupe.incrementalFromStore(bands, labels, emptyBatch, docs,
          "doc_id", "text", k, n, rpb, minJ)
          .queryExecution.toRdd.count()
      }
      night(); median((1 to 3).map(_ => night()))
    }
    val body = results.map { case (d, t) =>
      f""""1/$d":{"nightly_sec":$t%.2f,"vs_scratch":${t / base}%.2f}"""
    }.mkString(",")
    println(f"""{"metric":"incremental_probe","scratch_sec":$base%.2f,$body,"empty_batch_floor_sec":$floorT%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
