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

  /** Fixed-context sequence packing (Prefix.packSequences): documents
    * laid end-to-end by doc_id, the token stream chopped into 512-token
    * training contexts, one row per (doc, context) occupancy span. The
    * Spark side is the two-phase distributed prefix sum (range shuffle
    * + partition-local windows + broadcast offsets — NEVER a global-
    * order window, which runs on one partition); the oracle is DuckDB's
    * single-node global window, which must agree exactly because
    * doc_id is unique.
    */
  val q73 = Q("q73_sequence_pack",
    (s, dir) => graft.operators.Prefix.packSequences(
        Tables(s, dir, "documents"), "doc_id",
        size(split(col("text"), " ")), contextLen = 512L)
      .select(col("doc"), col("n_tokens"), col("tok_start"),
        col("bin_id"), col("bin_tok_start"), col("bin_tok_end")),
    Some("""
      WITH t AS (SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                 FROM documents),
      c AS (SELECT doc_id, n_tokens,
              CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM t)
      SELECT doc_id AS doc, n_tokens, cum - n_tokens AS tok_start,
        b.bin_id,
        GREATEST(cum - n_tokens, b.bin_id * 512) AS bin_tok_start,
        LEAST(cum, (b.bin_id + 1) * 512) AS bin_tok_end
      FROM c, LATERAL (SELECT unnest(range((cum - n_tokens) // 512,
                                           ((cum - 1) // 512) + 1)) AS bin_id) b
      WHERE n_tokens > 0"""))

  /** Target mixture weights for q74 (per language, summing to 1). */
  private val mixWeights = Map(
    "en" -> 0.5, "de" -> 0.2, "es" -> 0.15, "fr" -> 0.1, "zh" -> 0.05)

  private val mixValues = mixWeights.toSeq.sorted
    .map { case (l, w) => s"('$l', CAST($w AS DOUBLE))" }
    .mkString(", ")

  /** Mixture sampling to target proportions (Sampling.sourceMix): keep
    * rates derived at runtime from per-language counts so the kept
    * corpus matches the weight vector, sized by the binding stratum.
    * The oracle recomputes the SAME rate arithmetic (min over
    * count/weight, then weight·t/count) and the SAME md5-threshold
    * encoding in SQL — identical IEEE double expressions, so the
    * thresholds agree bit-for-bit.
    */
  val q74 = Q("q74_source_mix",
    (s, dir) => Sampling.sourceMix(
        Tables(s, dir, "documents"), "doc_id", "lang", mixWeights)
      .select(col("doc_id").as("doc"), col("lang")),
    Some(s"""
      WITH w(lang, wt) AS (VALUES $mixValues),
      n AS (SELECT lang, COUNT(*) AS cnt FROM documents
            JOIN w USING (lang) GROUP BY lang),
      t AS (SELECT MIN(cnt / wt) AS t FROM n JOIN w USING (lang)),
      r AS (SELECT n.lang,
              CASE WHEN w.wt * t.t / n.cnt >= 1 THEN 'g'
                   ELSE printf('%08x', CAST(floor(w.wt * t.t / n.cnt *
                     4294967296.0) AS BIGINT)) END AS thr
            FROM n JOIN w ON n.lang = w.lang CROSS JOIN t)
      SELECT doc_id AS doc, lang
      FROM documents JOIN r USING (lang)
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < thr"""))

  /** Per-group reservoir ([[Sampling.reservoir]]): exactly 20 docs per
    * language, chosen by md5 rank through the O(k)-state bounded-heap
    * aggregate (map-side partial aggregation — k rows per group cross
    * the shuffle, not the group). The oracle is the row_number window
    * form the heap replaces: first-12-hex md5 ordering equals the
    * engine's parsed-48-bit numeric ordering because equal-length hex
    * strings sort lexicographically as their values.
    */
  val q89 = Q("q89_reservoir",
    (s, dir) => Sampling.reservoir(
      Tables(s, dir, "documents"), "lang", "doc_id", k = 20),
    Some("""
      WITH r AS (SELECT lang, doc_id, row_number() OVER
          (PARTITION BY lang
           ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) ASC,
                    doc_id ASC) AS rn
        FROM documents)
      SELECT lang, CAST(rn AS BIGINT) AS rank, doc_id
      FROM r WHERE rn <= 20"""))

  override def all: Seq[Q] = Seq(q60, q61, q73, q74, q89)
}
