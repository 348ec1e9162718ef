package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling + data-budget coverage: hash-based stratified
  * sampling and per-source token-quota packing — the corpus-assembly
  * (data mixing) stages of a training-data pipeline. The per-stratum
  * rate VALUES in the oracle are generated from the same Scala map the
  * Spark side broadcasts — single source of truth.
  */
object SamplingQueries extends QueryPack {

  /** Downsample dominant strata, keep rare ones whole. */
  private val rates = Map(
    "en" -> 0.5, "zh" -> 0.25, "es" -> 0.125, "de" -> 1.0, "fr" -> 0.0625)

  private val dimValues = rates.toSeq.sorted
    .map { case (l, r) => s"('$l', '${Sampling.thresholdHex(r)}')" }
    .mkString(", ")

  /** Stratified deterministic sample: per-language keep rates via the
    * md5-prefix threshold (reproducible at any partitioning; the same
    * rows survive a corpus grow-and-rerun).
    */
  val q60 = Q("q60_stratified_sample",
    (s, dir) => Sampling.stratified(
        Tables(s, dir, "documents"), "doc_id", "lang", rates)
      .select(col("doc_id").as("doc"), col("lang")),
    Some(s"""
      WITH r(lang, thr) AS (VALUES $dimValues)
      SELECT doc_id AS doc, lang
      FROM documents JOIN r USING (lang)
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < thr"""))

  /** Token-budget quota pack: per source keep the largest documents
    * (deterministic doc_id tie-break) until 500 whitespace tokens are
    * spoken for — the per-source data-mixing cap.
    */
  val q61 = Q("q61_quota_pack",
    (s, dir) => Sampling.quotaPack(
        Tables(s, dir, "documents"), "source", "doc_id",
        size(split(col("text"), " ")), budget = 500L)
      .select(col("doc_id").as("doc"), col("source"),
        col("n_tokens"), col("cum_tokens")),
    Some("""
      WITH t AS (SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                 FROM documents),
      c AS (SELECT doc_id, source, n_tokens,
              CAST(SUM(n_tokens) OVER (PARTITION BY source
                ORDER BY n_tokens DESC, doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM t)
      SELECT doc_id AS doc, source, n_tokens, cum_tokens
      FROM c WHERE cum_tokens <= 500"""))

  override def all: Seq[Q] = Seq(q60, q61)
}
