package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Pq, Similarity}

/** ANN answer-quality probe: recall@10 against exact brute-force
  * ground truth, with wall seconds, for every approximate search
  * surface the engine ships —
  *
  *  - IVF (learned k-means centroids) across an nprobe sweep: the
  *    recall-vs-cost dial a serving deployment actually turns;
  *  - PQ asymmetric-distance (ADC) search, and the two-stage
  *    ADC-shortlist → exact-rerank path (rerank can only fix ordering
  *    WITHIN the shortlist, so its recall bounds tell you the
  *    shortlist size is/isn't the binding constraint);
  *  - SRP-LSH near-dup pair recall vs the exact pair set at the same
  *    cosine threshold (a PAIR metric, not top-k — reported as
  *    hit/truth counts).
  *
  * Determinism note: every searcher here is deterministic (min-id
  * k-means seeding, fixed Lloyd iterations, md5 hyperplanes), so the
  * recall numbers are exactly reproducible for a given dir — the
  * oracle suite proves the answers are STABLE; this probe measures
  * whether they are GOOD.
  *
  * The ground-truth cross products are O(|queries|·n) for top-k and
  * O(n²) for pairs: a measurement harness, not a scale path — the
  * pair corpus is capped (default 20k vectors) and the cap is printed.
  *
  * usage: RecallProbe <sfDir> [nQueries=100] [cells=auto] [pairCap=20000]
  * prints one JSON line: per-variant {recall, sec} + config.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RecallProbe <sfDir> [nQueries] [cells] [pairCap]")
    val sfDir = args(0)
    val nQueries = if (args.length > 1) args(1).toInt else 100
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
    // cluster-count discipline: cells ∝ corpus (bounded expected cell
    // size ~512), floor 16 so IVF always prunes — overridable
    val cells = if (args.length > 2 && args(2) != "auto") args(2).toInt
      else math.max(16L, n / 512L).toInt
    val pairCap = if (args.length > 3) args(3).toLong else 20000L
    val k = 10
    val queries = emb.filter(col("vec_id") < nQueries)
    // Frames every variant depends on (corpus, ground truth, code
    // tables): after the level-playing-field clearCache they are
    // re-persisted AND materialized BEFORE the clock starts, so each
    // timed section measures ONLY its own search. (The r14 probe
    // cleared globally and re-warmed only emb — every variant's "sec"
    // silently included a brute-force ground-truth recompute, visible
    // as inverted orderings like nprobe=16 "faster" than nprobe=8.)
    val warm = scala.collection.mutable.ArrayBuffer(emb)
    def timeIt[A](f: => A): (A, Double) = {
      spark.catalog.clearCache()
      warm.foreach { d => d.persist(); d.count() }
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // exact ground truth (also times the brute-force baseline — the
    // "cost of recall 1.0" every approximate line is compared against)
    val (truth, bruteSec) = timeIt {
      val t = Similarity.bruteForceTopK(queries, emb, "vec_id",
        "embedding", k, dim = 64).persist()
      t.count(); t
    }
    warm += truth
    val out = scala.collection.mutable.ArrayBuffer[String]()
    out += f""""brute":{"recall":1.0,"sec":$bruteSec%.2f}"""
    // IVF nprobe sweep over learned centroids (centroid training timed
    // separately — it is a once-per-corpus-version cost, like the store)
    val (centroids, trainSec) = timeIt {
      val c = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        cells, iters = 2, dim = 64)
      c
    }
    out += f""""ivf_train":{"cells":$cells,"sec":$trainSec%.2f}"""
    Seq(1, 2, 4, 8, 16).foreach { nprobe =>
      val (r, sec) = timeIt {
        val a = Similarity.ivfTopK(queries, emb, centroids, "vec_id",
          "embedding", k, nprobe, dim = 64)
        Similarity.meanRecallAtK(a, truth)
      }
      out += f""""ivf_nprobe$nprobe":{"recall":$r%.4f,"sec":$sec%.2f}"""
    }
    // PQ: the q81/q83 configuration (M=8, K=16, 1 Lloyd pass)
    val (cb, pqTrainSec) = timeIt {
      Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 1,
        dim = 64)
    }
    val codes = Pq.encode(emb, "vec_id", "embedding", cb).persist()
    codes.count()
    warm += codes
    out += f""""pq_train":{"sec":$pqTrainSec%.2f}"""
    val (adcR, adcSec) = timeIt {
      Similarity.meanRecallAtK(
        Pq.topK(queries, codes, cb, "vec_id", "embedding", k), truth)
    }
    out += f""""pq_adc":{"recall":$adcR%.4f,"sec":$adcSec%.2f}"""
    Seq(50, 200, 1000).foreach { shortlist =>
      val (rerR, rerSec) = timeIt {
        Similarity.meanRecallAtK(
          Pq.topKReranked(queries, codes, emb, cb, "vec_id",
            "embedding", k, shortlist), truth)
      }
      out += f""""pq_rerank$shortlist":{"recall":$rerR%.4f,"sec":$rerSec%.2f}"""
    }
    // a stronger codebook (K=64 codewords/subspace, 3 Lloyd passes):
    // shows recall is a CONFIG dial of the same operator, not a ceiling
    // of the implementation — 4x the code bits, same search plan
    val (cb64, pq64TrainSec) = timeIt {
      Pq.train(emb, "vec_id", "embedding", m = 8, k = 64, iters = 3,
        dim = 64)
    }
    val codes64 = Pq.encode(emb, "vec_id", "embedding", cb64).persist()
    codes64.count()
    warm += codes64
    out += f""""pq64_train":{"sec":$pq64TrainSec%.2f}"""
    val (adc64R, adc64Sec) = timeIt {
      Similarity.meanRecallAtK(
        Pq.topK(queries, codes64, cb64, "vec_id", "embedding", k), truth)
    }
    out += f""""pq64_adc":{"recall":$adc64R%.4f,"sec":$adc64Sec%.2f}"""
    val (rer64R, rer64Sec) = timeIt {
      Similarity.meanRecallAtK(
        Pq.topKReranked(queries, codes64, emb, cb64, "vec_id",
          "embedding", k, 200), truth)
    }
    out += f""""pq64_rerank200":{"recall":$rer64R%.4f,"sec":$rer64Sec%.2f}"""
    // the composed SERVING path: IVF-PQ index (cell-partitioned code
    // table, K=64 codebook) → probe-pruned ADC shortlist(200) → exact
    // rerank of shortlisted raw vectors. This is the configuration a
    // deployment runs — recall bounded by min(IVF cell coverage, PQ
    // shortlist quality), cost bounded by probed cells only.
    val ivfpqPath = s"${sys.props("java.io.tmpdir")}/graft_recall_ivfpq_" +
      spark.sparkContext.applicationId
    val (_, ivfpqIdxSec) = timeIt {
      Pq.writeIvfIndex(emb, centroids, "vec_id", "embedding", cb64,
        ivfpqPath)
    }
    out += f""""ivfpq_index":{"sec":$ivfpqIdxSec%.2f}"""
    // the serving dial: recall rises with nprobe (cell coverage) and
    // shortlist (what the exact re-rank can fix) — sweep both so the
    // curve names the cheapest config clearing any given floor
    Seq((8, 200), (16, 200), (16, 500), (24, 1000)).foreach {
      case (nprobe, shortlist) =>
        val (r, sec) = timeIt {
          Similarity.meanRecallAtK(
            Pq.ivfTopKReranked(spark, ivfpqPath, queries, centroids,
              emb, cb64, "vec_id", "embedding", k, nprobe, shortlist,
              dim = 64), truth)
        }
        out += f""""ivfpq_nprobe${nprobe}_rerank$shortlist":{"recall":$r%.4f,"sec":$sec%.2f}"""
    }
    // SRP-LSH pair recall on the (capped) corpus, across the banding
    // dial: rowsPerBand=8 (q62's config — few, high-precision bands)
    // vs 4 (16 looser bands: per-band collision prob rises from
    // p^8 to p^4, recall for threshold-grade pairs jumps accordingly,
    // candidate volume is the price)
    val srpCorpus = emb.filter(col("vec_id") < pairCap).persist()
    val srpN = srpCorpus.count()
    warm += srpCorpus
    Seq(8, 4).foreach { rpb =>
      val (found, srpSec) = timeIt {
        val f = Similarity.srpNearDupPairs(srpCorpus, "vec_id",
          "embedding", Similarity.srpSigns(64, 64), rowsPerBand = rpb,
          threshold = 0.35).persist()
        f.count(); f
      }
      val (hit, tot) = Similarity.pairRecall(found, srpCorpus, "vec_id",
        "embedding", 0.35, dim = 64)
      val srpRecall = if (tot == 0) 1.0 else hit.toDouble / tot
      out += f""""srp_pairs_rpb$rpb":{"recall":$srpRecall%.4f,"hit":$hit,"truth":$tot,"corpus":$srpN,"sec":$srpSec%.2f}"""
    }
    println(s"""{"metric":"recall","sf":"$sfDir","n":$n,"queries":$nQueries,"k":$k,${out.mkString(",")}}""")
    // the on-disk IVF-PQ index is probe scratch — reclaim it (multi-GB
    // /tmp residue per run at larger dirs otherwise)
    def rm(f: java.io.File): Unit =
      if (f.exists()) {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
    rm(new java.io.File(ivfpqPath))
    spark.stop()
  }
}
