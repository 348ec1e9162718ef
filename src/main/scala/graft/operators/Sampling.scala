package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and data-budget packing for training-data
  * pipelines.
  *
  * `rand()`-based sampling is neither reproducible across runs nor
  * verifiable against an oracle, and Spark's `sample()` changes with
  * partitioning. These operators hash a STABLE id instead: a row
  * survives iff the first 8 hex chars of md5(id) fall below a
  * rate-derived threshold — a pure narrow filter (no shuffle, no RNG
  * state), the same rows survive at any partitioning and in any engine
  * that computes md5, and re-running over a grown corpus keeps every
  * previously-kept row (incremental-friendly). The comparison is plain
  * ASCII-lexicographic on the hex prefix, portable across engines.
  *
  * Scale shape: bernoulli/stratified are single-scan projections —
  * they pipeline into whatever reads the sample with zero extra cost.
  * quotaPack is one hash-partition + per-group sort (the q06 running-
  * total shape); a pathologically hot group sorts on one node, so cap
  * group cardinality upstream if a group can exceed executor memory.
  */
object Sampling {

  private val HexDigits = 8

  /** Lexicographic hex threshold for a keep-rate: an md5's first 8 hex
    * chars are uniform over [0, 16^8) as a hex integer; keep iff
    * prefix < threshold. rate >= 1 returns "g" — lexicographically
    * above every hex string, so everything survives; rate <= 0 yields
    * "00000000" — nothing sorts below it, so nothing survives.
    */
  def thresholdHex(rate: Double): String =
    if (rate >= 1.0) "g"
    else {
      val t = math.max(0L, math.floor(rate * (1L << 32)).toLong)
      f"$t%08x"
    }

  /** The keep predicate on a stable id column. */
  def keep(id: Column, rate: Double): Column =
    substring(md5(id.cast("string")), 1, HexDigits) <
      lit(thresholdHex(rate))

  /** Deterministic Bernoulli(rate) sample keyed on `idCol`. */
  def bernoulli(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(keep(col(idCol), rate))

  /** Stratified sample: each stratum keeps its own rate (data-mixing
    * quotas — downsample the dominant language, keep the rare ones
    * whole). Rows whose stratum is absent from `rates` are dropped.
    * The rates dim broadcasts; the corpus scan stays narrow.
    */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = rates.toSeq.map { case (k, r) => (k, thresholdHex(r)) }
      .toDF(strataCol, "thr")
    df.join(broadcast(dim), Seq(strataCol))
      .filter(substring(md5(col(idCol).cast("string")), 1, HexDigits) <
        col("thr"))
      .drop("thr")
  }

  /** Mixture sampling to TARGET PROPORTIONS: downsample each stratum so
    * the kept corpus matches `weights` (summing to ~1) while keeping as
    * many rows as the binding stratum allows — the data-mixing step
    * that turns "whatever the crawl yielded" into "50% en, 20% de, …".
    *
    * The mixture size is maximal: t = min over strata of count/weight
    * is the largest total for which no stratum needs more rows than it
    * has; each stratum then keeps rate = weight·t/count of its rows
    * (the binding stratum keeps everything). Selection is the same
    * deterministic md5-threshold filter as [[stratified]] — expected
    * proportions are exact, realized counts are the hash draw.
    *
    * The per-stratum counts are ONE small aggregate collected to the
    * driver (|strata| rows — a plan parameter, like the IVF cell list
    * or Tuning's stats); the corpus itself is touched by a single
    * narrow filter scan. Strata absent from `weights` are dropped;
    * a stratum with weight > 0 but no rows forces t = 0 (an honest
    * "the requested mixture is unsatisfiable" — nothing survives).
    */
  def sourceMix(df: DataFrame, idCol: String, strataCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be non-empty and positive")
    val counts = df.filter(col(strataCol).isin(weights.keys.toSeq: _*))
      .groupBy(strataCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = weights.map { case (s, w) =>
      counts.getOrElse(s, 0L).toDouble / w
    }.min
    val rates = weights.map { case (s, w) =>
      s -> (if (counts.getOrElse(s, 0L) == 0L) 0.0
            else w * t / counts(s))
    }
    stratified(df, idCol, strataCol, rates)
  }

  /** Token-budget quota packing: per group, keep the largest documents
    * (ties broken by id — fully deterministic) until the group's
    * cumulative token count exceeds `budget`. The data-mixing step of
    * corpus assembly: every source gets at most `budget` tokens.
    * Output adds `n_tokens` and the inclusive running `cum_tokens`.
    */
  def quotaPack(df: DataFrame, groupCol: String, idCol: String,
      tokens: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col("n_tokens").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokens.cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Deterministic per-group reservoir: exactly min(k, |group|) rows
    * per group, chosen uniformly by md5 rank — the same seedless
    * hash-gated discipline as [[bernoulli]], so re-runs (and the
    * oracle) pick identical rows.
    *
    * The rank is the first 48 md5 bits of the id (exact in a Double),
    * and selection runs through the O(k)-state
    * [[graft.functions.TopKRowsAgg]] min-heap: map-side partial
    * aggregation reduces every input partition to ≤ k candidates per
    * group BEFORE the shuffle — the row_number window form would
    * shuffle and sort every row of every group, the 100 TB failure
    * mode for "take N examples per source". Output:
    * (group, rank 1..k, id) in rank order.
    */
  def reservoir(df: DataFrame, groupCol: String, idCol: String, k: Int)
      : DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // the payload rides TopKRowsAgg's LONG slot: a non-numeric id would
    // cast to NULL and be silently skipped (empty picks, no error) —
    // reject it up front instead
    val idType = df.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"reservoir: id column '$idCol' must be numeric (got $idType) — " +
        "TopKRowsAgg carries the id as a LONG payload")
    // built via the Column API (no SQL-string interpolation: column
    // names needing backticks parse fine, nothing to inject)
    val rank = negate(conv(
      substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("double"))
    val picks = ColumnBridge.column(graft.functions.TopKRowsAgg(
      ColumnBridge.expression(rank),
      ColumnBridge.expression(col(idCol).cast("long")),
      k).toAggregateExpression())
    df.groupBy(col(groupCol))
      .agg(picks.as("__picks"))
      .select(col(groupCol),
        posexplode(col("__picks")).as(Seq("__r", idCol)))
      .select(col(groupCol), (col("__r") + 1).cast("long").as("rank"),
        col(idCol))
  }
}
