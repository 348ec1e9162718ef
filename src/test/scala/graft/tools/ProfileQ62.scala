package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.Tables

/** Scratch profiler for the q62 stages — NOT part of the library. */
object ProfileQ62 {
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

    val signs = Similarity.srpSigns(planes = 64, dim = 64)
    val rowsPerBand = 8
    val nBands = signs.size / rowsPerBand
    (1 to 2).foreach { round =>
      println(s"=== round $round ===")
      spark.catalog.clearCache()
      val df = Tables(spark, sfDir, "embeddings")
      val bits = concat(signs.map(s =>
        when(Similarity.dotNative(col("embedding"), typedLit(s)) > 0,
          lit("1")).otherwise(lit("0"))): _*)
      val bitsOnly = df.select(col("vec_id").as("vid"), bits.as("bits"))
      time("bits.count")(bitsOnly.count())
      val sig = bitsOnly
        .withColumn("band", explode(sequence(lit(0), lit(nBands - 1))))
        .select(col("vid"), col("band"),
          col("bits").substr(col("band") * rowsPerBand + 1, lit(rowsPerBand))
            .as("bb"))
        .persist()
      time("sig.count")(sig.count())
      val cand = sig.select(col("vid").as("vec_a"), col("band"), col("bb"))
        .join(sig.select(col("vid").as("vec_b"), col("band"), col("bb")),
          Seq("band", "bb"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct()
      time("cand.count")(cand.count())
      val candP = cand.persist()
      time("candP.count")(candP.count())
      val vecs2 = df.select(col("vec_id").as("vid"), col("embedding").as("v"))
      val verified = candP
        .join(vecs2.select(col("vid").as("vec_a"), col("v").as("va")), "vec_a")
        .join(vecs2.select(col("vid").as("vec_b"), col("v").as("vb")), "vec_b")
        .filter(Similarity.dotNative(col("va"), col("vb")) /
          (sqrt(Similarity.dotNative(col("va"), col("va"))) *
           sqrt(Similarity.dotNative(col("vb"), col("vb")))) >= lit(0.35))
        .select("vec_a", "vec_b")
      time("verify.count")(verified.count())
      time("full q62 (srpNearDupPairs)")(
        Similarity.srpNearDupPairs(df, "vec_id", "embedding",
          signs, rowsPerBand, 0.35).count())
    }
    spark.stop()
  }
}
