package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental/streaming semantics in batch form (SURVEY.md §2.8):
  * tumbling event-time windows and gap-based sessionization. The same
  * aggregations run as a Structured Streaming job in
  * `graft.streaming.EventStreams`; batch-over-event-time is the
  * oracle-checkable form.
  */
object EventQueries extends QueryPack {

  /** ST1 — tumbling 1-hour event-time windows per event_type (the dated
    * ingestion-window semantics; in streaming this is
    * `groupBy(window($"ts","1 hour"))` + watermark).
    */
  val q32 = Q("q32_hourly_windows",
    (s, dir) => {
      val e = Tables(s, dir, "events")
      e.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double")
            .as("total"))
    },
    Some("""
      SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY date_trunc('hour', ts), event_type"""))

  /** Gap-based sessionization (30-min inactivity) via lag + running sum —
    * exact integer microsecond arithmetic on both engines.
    */
  val q33 = Q("q33_sessionize",
    (s, dir) => {
      val e = Tables(s, dir, "events")
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val us = unix_micros(col("ts"))
      val prev = lag(us, 1).over(byUser)
      val newSession = when(prev.isNull || (us - prev) > lit(1800000000L), 1L)
        .otherwise(0L)
      val sess = e.withColumn("session",
        sum(newSession).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy("user_id", "session")
        .agg(count(lit(1)).as("n_events"),
          (max(us) - min(us)).as("dur_us"))
    },
    Some("""
      WITH marked AS (SELECT user_id, event_id, epoch_us(ts) AS us,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (SELECT user_id, us,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
        FROM marked)
      SELECT user_id, CAST(session AS BIGINT) AS session,
             COUNT(*) AS n_events,
             CAST(MAX(us) - MIN(us) AS BIGINT) AS dur_us
      FROM sessions GROUP BY user_id, session"""))

  /** Mergeable HLL distinct-count sketches (operators.Sketches). The
    * sketch ESTIMATE is engine-specific (Spark's DataSketches HLL has
    * no DuckDB twin), so the driver-checkable surface is the
    * INVARIANT, not the bits: each group's exact distinct count plus
    * whether the HLL estimate lands within the 5% bound the sketch
    * family guarantees at lgK=12. The oracle asserts the bound holds
    * (`TRUE`), so a sketch regression past 5% hash-mismatches and
    * fails the gate — the same bound OperatorSpec golden-pins, made
    * driver-visible (this retired the suite's one rows-only row).
    * [[q76]] is the bit-for-bit sketch twin: its KMV estimator is
    * portable SQL and hash-matches exactly.
    */
  val q56 = Q("q56_distinct_sketch",
    (s, dir) => {
      val e = Tables(s, dir, "events")
      val est = graft.operators.Sketches.approxDistinct(
        e, Seq("event_type"), "user_id")
      e.groupBy("event_type")
        .agg(countDistinct("user_id").as("n_exact"))
        .join(est, "event_type")
        .select(col("event_type"), col("n_exact"),
          (abs(col("approx_distinct") - col("n_exact")) <=
            col("n_exact") * 0.05).as("within_5pct"))
    },
    Some("""
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
             TRUE AS within_5pct
      FROM events GROUP BY event_type"""))

  /** KMV (bottom-k) distinct sketch (Sketches.kmvDistinct /
    * functions.KmvSketchAgg) — the sketch whose estimate is portable
    * SQL: both engines take the k=64 smallest 60-bit md5-prefix hashes
    * of user_id per event_type and apply the (k-1)/v_k bottom-k
    * estimator, with the operation order in the double arithmetic
    * matched exactly so the estimate hash-matches bit-for-bit. The
    * Spark side is a mergeable TypedImperativeAggregate (k longs of
    * state per group per partition, map-side partials); the oracle
    * materializes the same k-th smallest hash via a window rank.
    */
  val q76 = Q("q76_kmv_distinct",
    (s, dir) => graft.operators.Sketches.kmvDistinct(
      Tables(s, dir, "events"), Seq("event_type"), "user_id", k = 64),
    Some("""
      WITH h AS (SELECT DISTINCT event_type,
          CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
               AS BIGINT) AS h
        FROM events),
      r AS (SELECT event_type, h,
          row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
          COUNT(*) OVER (PARTITION BY event_type) AS nd
        FROM h)
      SELECT event_type,
             CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
                  ELSE CAST(63 AS DOUBLE) /
                       (CAST(h AS DOUBLE) / pow(2.0, 60))
             END AS est_distinct
      FROM r WHERE rn = CASE WHEN nd < 64 THEN nd ELSE 64 END"""))

  /** As-of join (TemporalJoins.asOfJoin): attribute every purchase to
    * the user's most recent view at or before it — the classic
    * attribution shape. One tagged union + keyed shuffle-sort + running
    * last-non-null; the oracle is DuckDB's native ASOF JOIN, so the
    * sorted-window rewrite is checked against a reference
    * implementation of the semantics, not against itself.
    */
  val q63 = Q("q63_asof_join",
    (s, dir) => {
      val e = Tables(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
      graft.operators.TemporalJoins.asOfJoin(
          purchases, views, Seq("user_id"), "ts", Seq("view_id"))
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("asof").getField("view_id").as("view_id"))
    },
    Some("""
      SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS view_id
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id AND p.ts >= v.ts"""))

  /** Binned range join (TemporalJoins.pointInIntervals): events matched
    * into recurring 90-minute windows every 7 hours — the
    * point-in-interval join as a bin equi-join + exact re-filter, vs
    * DuckDB's native inequality join as the oracle. Epoch-micro
    * integer comparisons only.
    */
  val q64 = Q("q64_range_join",
    (s, dir) => {
      val baseUs = 1704067200000000L            // 2024-01-01 00:00:00 UTC
      val stepUs = 25200000000L                 // 7 h
      val lenUs = 5400000000L                   // 90 min
      val windows = s.range(0, 48).select(
        col("id").as("window_id"),
        (lit(baseUs) + col("id") * stepUs).as("lo_us"),
        (lit(baseUs) + col("id") * stepUs + lenUs).as("hi_us"))
      val pts = Tables(s, dir, "events")
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
      // bin width auto-derived from the windows' own length stats
      // (Tuning.typicalSpan = 90 min here — every window is the same
      // length); the exact predicate makes the width correctness-free
      graft.operators.TemporalJoins.pointInIntervals(
          pts, "us", windows, "lo_us", "hi_us")
        .select("event_id", "window_id")
    },
    Some("""
      WITH w AS (SELECT k AS window_id,
          1704067200000000 + k * 25200000000 AS lo_us,
          1704067200000000 + k * 25200000000 + 5400000000 AS hi_us
        FROM (SELECT unnest(range(48)) AS k)),
      e AS (SELECT event_id, epoch_us(ts) AS us FROM events)
      SELECT e.event_id, w.window_id
      FROM e JOIN w ON e.us >= w.lo_us AND e.us < w.hi_us"""))

  /** Interval-overlap join: per-(user, day) activity SPANS (first→last
    * event of each user within each UTC day — short, partial-day
    * intervals) against synthetic maintenance windows — every
    * (span, window) pair that overlaps. Both sides bin-replicate and
    * equi-join on the bin; the exact overlap predicate re-filters
    * bin-local candidates; never a nested loop.
    */
  val q70 = Q("q70_interval_overlap",
    (s, dir) => {
      val baseUs = 1704067200000000L            // 2024-01-01 00:00:00 UTC
      val stepUs = 43200000000L                 // 12 h
      val lenUs = 7200000000L                   // 2 h
      val dayUs = 86400000000L
      val windows = s.range(0, 28).select(
        col("id").as("window_id"),
        (lit(baseUs) + col("id") * stepUs).as("wlo_us"),
        (lit(baseUs) + col("id") * stepUs + lenUs).as("whi_us"))
      val spans = Tables(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .groupBy(col("user_id"), expr(s"us div ${dayUs}L").as("day"))
        .agg(min(col("us")).as("slo_us"),
          (max(col("us")) + 1).as("shi_us"))    // [lo, hi)
      // bin width auto-derived from both sides' length stats: the max
      // of the spans' median span and the 2 h window length. The spans
      // frame is a groupBy sub-plan the stats pass would recompute, so
      // persist it across stats + join (Bench/Verify clear the cache
      // per query).
      graft.operators.TemporalJoins.intervalOverlapJoin(
          spans.persist(), "slo_us", "shi_us", windows, "wlo_us", "whi_us")
        .select("user_id", "day", "window_id")
    },
    Some("""
      WITH w AS (SELECT k AS window_id,
          1704067200000000 + k * 43200000000 AS wlo_us,
          1704067200000000 + k * 43200000000 + 7200000000 AS whi_us
        FROM (SELECT unnest(range(28)) AS k)),
      sp AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
               MIN(epoch_us(ts)) AS slo_us,
               MAX(epoch_us(ts)) + 1 AS shi_us
             FROM events GROUP BY user_id, epoch_us(ts) // 86400000000)
      SELECT sp.user_id, sp.day, w.window_id
      FROM sp JOIN w ON sp.slo_us < w.whi_us AND w.wlo_us < sp.shi_us"""))

  /** SLIDING event-time windows (1 h length, 15 min slide): each event
    * lands in exactly 4 overlapping windows — `window(ts, len, slide)`
    * is the batch twin of the Structured Streaming form
    * ([[graft.streaming.EventStreams]] uses the same operator under a
    * watermark). Spark expands windows in-row (one Expand, slide-count
    * rows per event, then a normal hash agg); the oracle replicates
    * the expansion with a 4-row range product over epoch-aligned
    * 15-minute buckets. Decimal value sums, q32's discipline.
    */
  val q95 = Q("q95_sliding_windows",
    (s, dir) => {
      val e = Tables(s, dir, "events")
      e.groupBy(window(col("ts"), "1 hour", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double")
            .as("total"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("total"))
    },
    Some("""
      SELECT time_bucket(INTERVAL '15 minutes', ts)
               - CAST(k.k AS INT) * INTERVAL '15 minutes' AS win_start,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events, (SELECT unnest(range(4)) AS k) k
      GROUP BY 1, 2"""))

  /** Retention cohorts: users grouped by first-activity week, then for
    * each (cohort, weeks-since) the count of still-active users and the
    * retention rate. Three aggregations, each shuffle keyed smaller
    * than the last (events → (user, week) distinct → per-user min →
    * cohort counts); the |cohorts|-row size table broadcasts back for
    * the rate. Rate = one IEEE divide of two exact longs — bit-equal
    * across engines. Monday-start date_trunc('week') on both sides.
    */
  val q99 = Q("q99_retention",
    (s, dir) => {
      val e = Tables(s, dir, "events")
      val uw = e.select(col("user_id"),
        date_trunc("week", col("ts")).as("week")).distinct()
      val cohorts = uw.groupBy("user_id").agg(min("week").as("cohort"))
      val act = uw.join(cohorts, "user_id")
        .withColumn("k", (datediff(col("week"), col("cohort")) / 7)
          .cast("int"))
        .groupBy("cohort", "k")
        .agg(countDistinct(col("user_id")).as("n_active"))
      val sizes = cohorts.groupBy("cohort")
        .agg(count(lit(1)).as("cohort_size"))
      act.join(broadcast(sizes), "cohort")
        .select(col("cohort"), col("k"), col("n_active"),
          col("cohort_size"),
          (col("n_active").cast("double") / col("cohort_size"))
            .as("retention"))
    },
    Some("""
      WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week
                  FROM events),
      cohorts AS (SELECT user_id, MIN(week) AS cohort FROM uw
                  GROUP BY user_id),
      act AS (SELECT c.cohort,
                CAST(datediff('day', c.cohort, uw.week) / 7 AS INT) AS k,
                COUNT(DISTINCT uw.user_id) AS n_active
              FROM uw JOIN cohorts c USING (user_id)
              GROUP BY 1, 2),
      sizes AS (SELECT cohort, COUNT(*) AS cohort_size FROM cohorts
                GROUP BY cohort)
      SELECT cohort, k, n_active, cohort_size,
        CAST(n_active AS DOUBLE) / cohort_size AS retention
      FROM act JOIN sizes USING (cohort)"""))

  override def all: Seq[Q] =
    Seq(q32, q33, q56, q63, q64, q70, q76, q95, q99)
}
