package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark's built-in operators don't express directly:
  * as-of (most recent match at or before a timestamp) and
  * point-in-interval range joins.
  *
  * Both have the same failure mode at scale — the naive inequality
  * theta-join degenerates to a nested-loop over the pair product — and
  * the same cure: rewrite into an equi-join-shaped plan (one sorted
  * shuffle for as-of, a bin equi-join for ranges) that Catalyst
  * schedules like any other hash/sort operator.
  */
object TemporalJoins {

  /** As-of join: every left row picks the single most recent right row
    * with equal `keyCols` and right ts <= left ts (the attribution /
    * "rate in effect at event time" join).
    *
    * Plan shape: tag and union both sides, ONE hash-partition by key +
    * in-partition sort by (ts, tag), and a last-non-null running window
    * carries each right row's payload forward to the left rows that
    * follow it. Cost is one shuffle-sort over |L| + |R| — the pair
    * product never exists, unlike a `l.ts >= r.ts` theta-join (which
    * Spark can only nested-loop) followed by a per-left top-1. Right
    * rows sort BEFORE left rows at equal ts (tag 0 < 1), giving the
    * standard inclusive `>=` semantics.
    *
    * The right payload travels as ONE struct column, so a match is
    * detected by struct-nullness even when individual payload fields
    * are null. Right rows should be unique per (key, ts) — with
    * duplicates, which of the tied rows wins is unspecified (like SQL
    * ASOF JOIN).
    *
    * Output: every left column, plus `asof` (struct of `payloadCols`;
    * null = no match) — rows without a match are kept when `leftOuter`,
    * dropped otherwise (inner, the SQL ASOF JOIN default).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      leftOuter: Boolean = false): DataFrame = {
    val lCols = left.columns.toSeq
    val l = left.withColumn("__tag", lit(1))
    val r = right.select(
      keyCols.map(col) ++ Seq(col(tsCol),
        struct(payloadCols.map(col): _*).as("__p")): _*)
      .withColumn("__tag", lit(0))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(lCols.map(col) :+ col("__m").as("asof"): _*)
    if (leftOuter) joined else joined.filter(col("asof").isNotNull)
  }

  /** Point-in-interval range join: pairs every point row with every
    * interval row whose [lo, hi) contains it (events → maintenance
    * windows, readings → calibration periods).
    *
    * Plan shape: both sides map onto fixed-width bins — a point lands
    * in exactly one, an interval replicates into the ceil(len/bin)+1
    * bins it overlaps — the bins equi-join (hash shuffle, never a
    * nested loop), and the exact predicate re-filters the bin-local
    * candidates. Work scales with true bin collisions; `binWidth`
    * should be ~the typical interval length (too small replicates
    * intervals, too large widens candidate lists). All three columns
    * are integer epochs (micros) — use `unix_micros` upstream.
    */
  def pointInIntervals(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    // `div` = integral division: exact on longs (a double divide
    // rounds, which can flip a bin at exact boundaries)
    val pb = points.withColumn("__bin", expr(s"$pCol div ${binWidth}L"))
    // empty/inverted intervals ([x,x) or hi < lo) contain nothing, and
    // unfiltered an inverted interval makes sequence() DESCEND — every
    // bin from lo down to hi, spurious replication the exact predicate
    // then has to discard
    val ib = intervals.filter(col(loCol) < col(hiCol)).withColumn("__bin",
      explode(sequence(expr(s"$loCol div ${binWidth}L"),
        expr(s"($hiCol - 1) div ${binWidth}L"))))
    pb.join(ib, "__bin")
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__bin")
  }

  /** [[pointInIntervals]] with the bin width derived from the interval
    * side's own length statistics (median length via
    * [[graft.core.Tuning.typicalSpan]]) instead of a caller-supplied
    * constant. Costs one extra scalar aggregation over `intervals` —
    * which is typically the small side of this join — and never
    * changes the result, only the replication/collision balance.
    */
  def pointInIntervals(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String): DataFrame =
    pointInIntervals(points, pCol, intervals, loCol, hiCol,
      graft.core.Tuning.typicalSpan(intervals, loCol, hiCol))

  /** Interval-overlap join: pairs every left interval [llo, lhi) with
    * every right interval [rlo, rhi) that overlaps it (session spans ×
    * incident windows, leases × maintenance periods).
    *
    * Plan shape: the same bin rewrite as [[pointInIntervals]], on both
    * sides — each interval replicates into its spanned fixed-width
    * bins, the bins equi-join, and the exact overlap predicate
    * (`llo < rhi && rlo < lhi`) re-filters. An overlapping pair shares
    * at least one bin (their intersection lies in some bin both sides
    * replicated into), so the rewrite finds every pair — but a pair
    * spanning several shared bins collides once per bin, so the
    * bin-local candidates dedup on the join before the caller sees
    * them. Work scales with bin collisions; the nested-loop
    * theta-join this replaces is |L|×|R| at any bin width.
    */
  def intervalOverlapJoin(left: DataFrame, lloCol: String, lhiCol: String,
      right: DataFrame, rloCol: String, rhiCol: String,
      binWidth: Long): DataFrame = {
    // half-open semantics: an empty interval [x,x) overlaps NOTHING —
    // but it satisfies the overlap predicate against any interval
    // containing x, so it must be dropped BEFORE the join (and an
    // inverted interval, hi < lo, would make sequence() descend,
    // replicating into every bin from lo down to hi)
    val lb = left.filter(col(lloCol) < col(lhiCol)).withColumn("__bin",
      explode(sequence(expr(s"$lloCol div ${binWidth}L"),
        expr(s"($lhiCol - 1) div ${binWidth}L"))))
    val rb = right.filter(col(rloCol) < col(rhiCol)).withColumn("__bin",
      explode(sequence(expr(s"$rloCol div ${binWidth}L"),
        expr(s"($rhiCol - 1) div ${binWidth}L"))))
    lb.join(rb, "__bin")
      .filter(col(lloCol) < col(rhiCol) && col(rloCol) < col(lhiCol))
      .drop("__bin")
      .distinct()
  }

  /** [[intervalOverlapJoin]] with the bin width derived from interval
    * length statistics: the LARGER of the two sides' median lengths
    * ([[graft.core.Tuning.typicalSpan]]). A bin of ~the longer side's
    * typical length bounds that side's replication at ~2 bins per
    * interval while the shorter side replicates ~1× — whereas a bin
    * sized to the shorter side would replicate every long interval
    * len_long/len_short times. Costs one scalar aggregation per side;
    * callers whose interval frames are expensive sub-plans should
    * persist them first or pass an explicit width.
    */
  def intervalOverlapJoin(left: DataFrame, lloCol: String, lhiCol: String,
      right: DataFrame, rloCol: String, rhiCol: String): DataFrame =
    intervalOverlapJoin(left, lloCol, lhiCol, right, rloCol, rhiCol,
      math.max(graft.core.Tuning.typicalSpan(left, lloCol, lhiCol),
        graft.core.Tuning.typicalSpan(right, rloCol, rhiCol)))
}
