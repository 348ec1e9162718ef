package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedupe

/** A/B probe for the decontamination plans: the fused Bloom-prefilter
  * form ([[Dedupe.contamination]], r13) against the exploded form
  * ([[Dedupe.contaminationExplode]]) on one scale directory. q66 was
  * the steepest 100×-scaling query in SCALING.md's r13 table (17.8×
  * wall for 100× rows — strictly linear in corpus tokens with no
  * collision bound to hide behind), so its constant factor IS its
  * scale story; this probe records the measured ratio the fused
  * expression buys. Prints one JSON line.
  *
  * usage: ContamProbe <sfDir> [runs=3]
  */
object ContamProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ContamProbe <sfDir> [runs]")
    val dir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
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
    val docs = Tables(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val bench = docs.filter(col("doc_id") % 7 === 0)
    def timeIt(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def series(f: => Long): (Seq[Double], Long) = {
      timeIt(f) // warm-up
      val ts = (1 to runs).map(_ => timeIt(f))
      (ts.map(_._1), ts.head._2)
    }
    val fpp = sys.env.getOrElse("CONTAM_FPP", "0.001").toDouble
    val (fused, nF) = series(Dedupe.contamination(
      corpus, bench, "doc_id", "text", 5, 0.5,
      prefilterFpp = fpp).count())
    val (expl, nE) = series(Dedupe.contaminationExplode(
      corpus, bench, "doc_id", "text", 5, 0.5).count())
    require(nF == nE, s"plan mismatch: fused=$nF exploded=$nE")
    println(f"""{"metric":"contam_probe","fused_sec":${med(fused)}%.2f,""" +
      f""""exploded_sec":${med(expl)}%.2f,""" +
      f""""speedup":${med(expl) / med(fused)}%.2f,"rows":$nF,""" +
      s""""fused_runs":[${fused.map(t => f"$t%.2f").mkString(",")}],""" +
      s""""exploded_runs":[${expl.map(t => f"$t%.2f").mkString(",")}],""" +
      s""""dir":"$dir"}""")
    spark.stop()
  }
}
