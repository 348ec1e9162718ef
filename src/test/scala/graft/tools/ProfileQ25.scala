package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedupe, TextAnalysis}
import graft.Tables

/** Scratch profiler for the q25 stages (current verifyJaccardBySets
  * shape) — NOT part of the library.
  */
object ProfileQ25 {
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
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    (1 to 3).foreach { round =>
      println(s"=== round $round ===")
      spark.catalog.clearCache()
      val docs = Tables(spark, sfDir, "documents")
      val sig = Dedupe.minhashWide(docs, "doc_id", "text", 3, 16)
      val cand = Dedupe.minhashCandidates(sig, 16, 4).persist()
      time("1 cand.count (materialize)")(println("  cand=" + cand.count()))
      val candDocs = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      time("2 candDocs.count")(println("  docs=" + candDocs.count()))
      val candTexts = docs.select(col("doc_id"), col("text"))
        .join(broadcast(candDocs), Seq("doc_id"))
      time("3 candTexts.count")(candTexts.count())
      val sets = Dedupe.shingleRowsAll(candTexts, "doc_id", "text", 3)
        .groupBy("doc").agg(collect_set(col("shingle")).as("shset"))
        .persist()
      time("4 sets.count (materialize)")(sets.count())
      val joined = cand.select("doc_a", "doc_b")
        .join(sets.select(col("doc").as("doc_a"), col("shset").as("set_a")),
          "doc_a")
        .join(sets.select(col("doc").as("doc_b"), col("shset").as("set_b")),
          "doc_b")
      time("5 pair joins")(joined.count())
      val full = joined
        .withColumn("inter",
          size(array_intersect(col("set_a"), col("set_b"))))
        .withColumn("jaccard", col("inter") /
          (size(col("set_a")) + size(col("set_b")) - col("inter"))
            .cast("double"))
        .filter(col("jaccard") >= lit(0.5))
      time("6 intersect+filter")(full.count())
      time("7 whole q25 (fresh, caches warm)")(
        Dedupe.verifyJaccardBySets(cand, docs, "doc_id", "text", 3, 0.5)
          .count())
      spark.catalog.clearCache()
      time("8 whole q25 (cold)") {
        val s2 = Dedupe.minhashWide(docs, "doc_id", "text", 3, 16)
        val c2 = Dedupe.minhashCandidates(s2, 16, 4).persist()
        Dedupe.verifyJaccardBySets(c2, docs, "doc_id", "text", 3, 0.5)
          .count()
      }
    }
    spark.stop()
  }
}
