package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the documents table: BM25 top-k — the
  * keyword half of corpus curation (targeted quality retrieval,
  * query-based decontamination audits, hard-negative mining for
  * training-data pipelines). Robertson/Spärck Jones BM25 with the
  * Lucene-style idf = ln(1 + (N - df + ½)/(df + ½)), which is never
  * negative (public literature; the reference has no text retrieval —
  * its ES push delegates scoring to Elasticsearch, data_refresh/
  * data_refresh_task_factory.py:183-240 — so this is the engine-native
  * equivalent of what the reference outsources).
  *
  * Scale shape — the inverted-index join, never a corpus × queries
  * product:
  *  - the postings table (term, doc_id, tf) and the per-doc length
  *    table are corpus statistics computed in ONE tokenize+aggregate
  *    pass and worth materializing ([[writeIndex]]); df/N/avgdl are
  *    by-products of the same pass.
  *  - query terms (tiny) BROADCAST against postings, so only the
  *    postings rows of queried terms survive the scan (with the index
  *    sorted by term, row groups of unqueried terms are skipped via
  *    min/max pruning); the only corpus-scale shuffle is the final
  *    per-(query, doc) score aggregation, whose input is already
  *    pruned to matching postings.
  *
  * Determinism (oracle parity): tf/df/N/dl are exact longs; avgdl is
  * an exact long ratio cast to double (NOT a float avg, whose
  * accumulation order differs between engines); per-posting
  * contributions are bit-identical double expressions mirrored
  * term-for-term in the oracle SQL; the per-doc score sums them as
  * DECIMAL(28,12) — order-independent and exact — so ranking ties
  * break identically (score desc, doc_id asc) in both engines.
  */
object Retrieval {

  /** Lowercased alphanumeric tokens; empties dropped by callers. */
  def tokensCol(text: Column): Column = split(lower(text), "[^a-z0-9]+")

  /** (doc_id, term, tf) — one tokenize pass, map-side combined. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(tokensCol(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** BM25 top-k for a (query_id, term) frame against a postings table
    * and its per-doc-length companion. `queryTerms` must be distinct
    * per (query_id, term) — repeated query terms count once, the
    * standard bag-of-words query form.
    */
  def bm25TopK(postings: DataFrame, queryTerms: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      caches: graft.core.CacheHandle = graft.core.CacheHandle.session)
      : DataFrame = {
    // four consumers derive from the postings frame (dl, stats via dl,
    // qpost, df via qpost) — unpersisted, each re-runs the whole
    // tokenize+aggregate lineage (measured 4 passes at sf0.1); eager so
    // concurrent AQE stages can't race the unmaterialized cache either
    val post = graft.core.CacheHandle.eager(caches.track(
      postings.persist()))
    // dl also has two consumers (stats + the score join); cached, its
    // corpus-wide aggregation runs once
    val dl = graft.core.CacheHandle.eager(caches.track(
      post.groupBy("doc_id").agg(sum("tf").as("dl")).persist()))
    val stats = dl.agg(count(lit(1)).as("n"),
      (sum("dl").cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    // postings of queried terms only — the broadcast semi-join is what
    // keeps the scored set proportional to matches, not to the corpus
    val qpost = post.join(
      broadcast(queryTerms.select("term").distinct()), "term")
    val dfq = qpost.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib =
      log(lit(1.0) + (col("n") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
        (col("tf") * (lit(k1) + lit(1.0))) /
        (col("tf") + lit(k1) *
          (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    broadcast(queryTerms).join(qpost, "term")
      .join(broadcast(dfq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("c", contrib.cast("decimal(28,12)"))
      .groupBy("query_id", "doc_id").agg(sum("c").as("score"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"))
  }

  /** Convenience: tokenize + score in one call (the oracle-checked
    * query path). Real deployments split this: [[writeIndex]] once,
    * [[topKIndexed]] per query batch.
    */
  def bm25TopKOverDocs(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: DataFrame, k: Int): DataFrame =
    bm25TopK(postings(docs, idCol, textCol), queryTerms, k)

  /** Materialize the inverted index: postings repartitioned and sorted
    * by term (parquet min/max row-group pruning makes a term lookup
    * skip everything else). At 100 TB this is the one corpus pass;
    * every retrieval after it reads only queried terms' postings.
    */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, parts: Int = 32): Unit =
    postings(docs, idCol, textCol)
      .repartition(parts, col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(path)

  def topKIndexed(spark: SparkSession, indexPath: String,
      queryTerms: DataFrame, k: Int): DataFrame =
    bm25TopK(spark.read.parquet(indexPath), queryTerms, k)
}
