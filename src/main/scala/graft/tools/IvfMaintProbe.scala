package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Nightly-maintenance cycle probe for the materialized IVF index:
  * build → N appends (fragmenting every touched cell) → search the
  * fragmented index → compact ([[Similarity.compactIvfCells]]) →
  * search the compacted index. Measures what compaction buys (probe
  * wall time vs fragment count) and what it costs, and asserts the
  * two searches agree — the same invariant PqSpec pins at spec scale.
  *
  * usage: IvfMaintProbe <sfDir> [appends=8] [cells=auto]
  */
object IvfMaintProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IvfMaintProbe <sfDir> [appends] [cells]")
    val sfDir = args(0)
    val nAppends = if (args.length > 1) args(1).toInt else 8
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
    val emb = Tables(spark, sfDir, "embeddings").persist()
    val n = emb.count()
    val cells = if (args.length > 2 && args(2) != "auto") args(2).toInt
      else math.max(16L, n / 512L).toInt
    val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_maint_" +
      spark.sparkContext.applicationId
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    try {
      val centroids = Similarity.kmeansCentroids(emb, "vec_id",
        "embedding", cells, iters = 2, dim = 64)
      // corpus minus the nightly slices; each slice appends separately
      val base = emb.filter(col("vec_id") % (nAppends + 1) === 0)
      val buildSec = timed {
        Similarity.writeIvfIndex(base, centroids, "vec_id", "embedding",
          path)
      }
      val appendSecs = (1 to nAppends).map { i =>
        timed {
          Similarity.appendToIvfIndex(
            emb.filter(col("vec_id") % (nAppends + 1) === i),
            centroids, "vec_id", "embedding", path)
        }
      }
      def files(): Int = {
        def walk(f: java.io.File): Int =
          if (f.isDirectory)
            Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
          else if (f.getName.endsWith(".parquet")) 1 else 0
        // count the CURRENT version's files (compaction installs a new
        // version behind a pointer flip; the previous version lingers
        // as read grace and would double the naive count)
        walk(new java.io.File(
          Similarity.currentIvfRoot(spark, path)))
      }
      val queries = emb.filter(col("vec_id") < 100)
      def search(): Set[(Long, Long)] = Similarity.ivfTopKIndexed(spark,
          path, queries, centroids, "vec_id", "embedding", 10,
          nprobe = 8, dim = 64)
        .select("vec_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      search() // codegen warm-up
      val filesFrag = files()
      val t0 = System.nanoTime()
      val fragResult = search()
      val fragSec = (System.nanoTime() - t0) / 1e9
      val compactSec = timed { Similarity.compactIvfCells(spark, path) }
      val filesCompact = files()
      val t1 = System.nanoTime()
      val compactResult = search()
      val compactSearchSec = (System.nanoTime() - t1) / 1e9
      val identical = fragResult == compactResult
      println(f"""{"metric":"ivf_maint","sf":"$sfDir","n":$n,"cells":$cells,"appends":$nAppends,"build_sec":$buildSec%.2f,"append_sec_each":${appendSecs.map(t => f"$t%.2f").mkString("[", ",", "]")},"files_fragmented":$filesFrag,"files_compacted":$filesCompact,"search_frag_sec":$fragSec%.2f,"compact_sec":$compactSec%.2f,"search_compact_sec":$compactSearchSec%.2f,"results_identical":$identical}""")
    } finally {
      def rm(f: java.io.File): Unit = if (f.exists()) {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(path))
    }
    spark.stop()
  }
}
