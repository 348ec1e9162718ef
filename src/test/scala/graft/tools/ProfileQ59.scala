package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedupe
import graft.Tables

/** Scratch profiler for the q59 stages — NOT part of the library. */
object ProfileQ59 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROF_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROF_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    (1 to 2).foreach { round =>
      spark.catalog.clearCache()
      println(s"=== round $round ===")
      val docs = Tables(spark, sfDir, "documents")
      val sig = Dedupe.minhashWide(docs, "doc_id", "text", 3, 16)
      val cand = time("candidates") {
        val c = Dedupe.minhashCandidates(sig, 16, 4).persist()
        c.count(); c
      }
      val pairs = time("verify") {
        val p = Dedupe.verifyJaccardBySets(
          cand, docs, "doc_id", "text", shingleK = 3, minJaccard = 0.5)
          .persist()
        println(s"  pairs=${p.count()}"); p
      }
      val labels = time("cc") {
        val l = Dedupe.connectedComponents(pairs, "doc_a", "doc_b")
        println(s"  labels=${l.count()}"); l
      }
      // inline CC replica with per-stage timings
      time("cc-inline") {
        val und = time("  und") {
          val u = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
            .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
            .distinct().persist()
          u.count(); u
        }
        var lb = time("  init") {
          und.select(col("src").as("node"), col("src").as("label"))
            .distinct().localCheckpoint()
        }
        var prev = lb.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
        var done = false
        var it = 0
        while (!done && it < 25) {
          val s = time(s"  round$it") {
            val via = und.join(lb, und("dst") === lb("node"))
              .select(und("src").as("node"), col("label"))
            val nx = lb.union(via).groupBy("node").agg(min("label").as("label"))
              .localCheckpoint(false)
            val s0 = nx.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
            lb = nx; s0
          }
          done = s.compareTo(prev) == 0; prev = s; it += 1
        }
        und.unpersist()
        println(s"  rounds=$it")
      }
      time("sizes+join") {
        val sizes = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
        labels.join(sizes, "label").count()
      }
      // NEW pipeline: bucket-grouped candidate pairs + one-join verify
      spark.catalog.clearCache()
      time("NEW full") {
        val fanned = docs
        val sig2 = Dedupe.minhashWide(fanned, "doc_id", "text", 3, 16)
        val cand2 = time("  NEW candidates") {
          val c = Dedupe.minhashCandidatePairs(sig2, 16, 4).persist()
          println(s"  cand=${c.count()}"); c
        }
        val pairs2 = Dedupe.verifyJaccardOneJoin(
          cand2, fanned, "doc_id", "text", shingleK = 3, minJaccard = 0.5)
        val labels2 = time("  NEW verify+cc") {
          val l = Dedupe.connectedComponents(pairs2, "doc_a", "doc_b",
            distinctEdges = true)
          println(s"  labels=${l.count()}"); l
        }
        time("  NEW window") {
          labels2.withColumn("cluster_size", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("label")))
            .count()
        }
      }
    }
    spark.stop()
  }
}
