package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedupe, SignatureStore}

/** Phase-level timing of q80's exact body (build → night1 → night2 →
  * final read), with night sub-phases (sign, candidates+merge,
  * commit), to locate the nightly fixed overhead SCALING.md tracks.
  * usage: NightlyPhaseProbe <sfDir> [reps=3]
  */
object NightlyPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
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
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    (1 to reps).foreach { rep =>
      spark.catalog.clearCache()
      org.apache.spark.sql.graftbridge.CheckpointBridge
        .releaseAllPersisted(spark)
      val docs = Tables(spark, sfDir, "documents")
      val store = java.nio.file.Files
        .createTempDirectory("graft_phase_q80").toString
      new java.io.File(store).delete()
      val build = t { SignatureStore.ensureCorpusState(spark, store,
        docs.filter(col("doc_id") % 4 < 2), "doc_id", "text",
        k, n, rpb, minJ) }
      val nights = Seq(2, 3).map { m =>
        val batch = docs.filter(col("doc_id") % 4 === m)
        var tSign = 0.0; var tCand = 0.0; var tCommit = 0.0
        val total = t {
          val (bands, labels) = (SignatureStore.readBands(spark, store),
            SignatureStore.readLabels(spark, store))
          var sig: org.apache.spark.sql.DataFrame = null
          tSign = t { sig = graft.core.CacheHandle.eager(
            Dedupe.minhashWide(batch, "doc_id", "text", k, n,
              withCount = true).persist()) }
          var md: (org.apache.spark.sql.DataFrame,
            org.apache.spark.sql.DataFrame) = null
          tCand = t { md = Dedupe.incrementalFromStoreWithDelta(
            bands, labels, batch, docs, "doc_id", "text", k, n, rpb,
            minJ, preSigned = Some(sig)) }
          tCommit = t { SignatureStore.appendBatch(spark, store, sig,
            md._1, n, rpb, labelDelta = Some(md._2)) }
          sig.unpersist()
        }
        (total, tSign, tCand, tCommit)
      }
      var readSec = 0.0
      val outSec = t {
        val (_, labelsFinal) = SignatureStore.read(spark, store)
        readSec = t { labelsFinal.count() }
        labelsFinal
          .withColumn("cluster_size", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("label")))
          .select(col("node").as("doc"), col("label").as("cluster"),
            col("cluster_size"))
          .queryExecution.toRdd.count()
      }
      def f(d: Double) = f"$d%.2f"
      println(s"rep=$rep build=${f(build)} " +
        nights.zipWithIndex.map { case ((tot, s, c, w), i) =>
          s"night${i + 1}[total=${f(tot)} sign=${f(s)} cand=${f(c)} " +
            s"commit=${f(w)}]"
        }.mkString(" ") +
        s" out=${f(outSec)} (labelread=${f(readSec)})")
      def rm(fd: java.io.File): Unit = if (fd.exists()) {
        if (fd.isDirectory) Option(fd.listFiles()).foreach(_.foreach(rm))
        fd.delete()
      }
      rm(new java.io.File(store))
    }
    spark.stop()
  }
}
