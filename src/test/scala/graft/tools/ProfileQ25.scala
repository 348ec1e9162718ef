package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedupe
import graft.Tables

/** Scratch profiler for the q25 stages — NOT part of the library. */
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

    val docs = Tables(spark, sfDir, "documents")
    (1 to 2).foreach { round =>
      println(s"=== round $round ===")
      spark.catalog.clearCache()
      val shAll = Dedupe.shingleRowsAll(docs, "doc_id", "text", 3)
      val sigRaw = Dedupe.minhashWideFromShingles(shAll, 16)
      val candP = Dedupe.minhashCandidates(sigRaw, 16, 4).persist()
      time("candP.count")(candP.count())
      val candDocs = candP.select(col("doc_a").as("doc"))
        .union(candP.select(col("doc_b").as("doc"))).distinct()
      time("candDocs.count")(candDocs.count())
      val sh = shAll.join(broadcast(candDocs), Seq("doc")).distinct()
      time("sh(filtered).count")(sh.count())
      val shP = sh.persist()
      time("shP.count")(shP.count())
      val sizes = shP.groupBy("doc").agg(count(lit(1)).as("sz"))
      time("sizes.count")(sizes.count())
      val inter = candP.select("doc_a", "doc_b")
        .join(shP.select(col("doc").as("doc_a"), col("shingle")), "doc_a")
        .join(shP.select(col("doc").as("doc_b"), col("shingle")),
          Seq("doc_b", "shingle"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      time("inter.count")(inter.count())
      time("verify(full, sh persisted)")(
        Dedupe.verifyJaccardShingled(candP, shP, 0.5).count())
      time("verify(full, sh unpersisted)")(
        Dedupe.verifyJaccardShingled(candP, sh, 0.5).count())
      shP.unpersist(); candP.unpersist()
    }
    spark.stop()
  }
}
