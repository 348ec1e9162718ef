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

  /** Mergeable HLL distinct-count sketches (operators.Sketches). No
    * DuckDB oracle — sketch estimates are engine-specific — so the
    * driver records the weaker rows-only check here; the hard
    * verification is OperatorSpec's 5% error bound against exact
    * counts and the exact merge-identity property.
    */
  val q56 = Q("q56_distinct_sketch",
    (s, dir) => graft.operators.Sketches.approxDistinct(
      Tables(s, dir, "events"), Seq("event_type"), "user_id"),
    None)

  override def all: Seq[Q] = Seq(q32, q33, q56)
}
