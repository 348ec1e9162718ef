package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.operators.Popularity
import org.apache.spark.sql.functions._

/** The reference's popularity analytics (SURVEY.md §2.4 A1–A3 + J10):
  * exact Postgres `percentile_disc`, constants derivation, standardized
  * scoring via broadcast join. `events` stands in for the media table
  * (event_type = provider, value = the meta_data metric).
  */
object PopularityQueries extends QueryPack {

  private val P = 0.85

  /** A1 — exact discrete percentile per provider. */
  val q10 = Q("q10_percentile_disc",
    (s, dir) => Popularity.percentileDisc(
      Tables(s, dir, "events"), Seq("event_type"), "value", P)
      .select("event_type", "pct"),
    Some("""
      SELECT event_type,
             percentile_disc(0.85) WITHIN GROUP (ORDER BY value) AS pct
      FROM events GROUP BY event_type"""))

  /** A2 — popularity constant ((1-p)/p * clamped percentile).
    * The oracle mirrors Spark's double literal arithmetic exactly
    * (DuckDB bare numeric literals are DECIMAL → explicit DOUBLE casts).
    */
  val q11 = Q("q11_popularity_constants",
    (s, dir) => Popularity.constants(
      Tables(s, dir, "events"), Seq("event_type"), "value", P)
      .select("event_type", "pct", "constant"),
    Some("""
      SELECT event_type, pct,
        ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(0.85 AS DOUBLE)) *
          (CASE WHEN pct <= CAST(0.0 AS DOUBLE) THEN CAST(1.0 AS DOUBLE) ELSE pct END) AS constant
      FROM (SELECT event_type,
              percentile_disc(0.85) WITHIN GROUP (ORDER BY value) AS pct
            FROM events GROUP BY event_type)"""))

  /** A3/J10 — standardized score metric/(metric+constant) for every fact
    * row via broadcast of the tiny constants dim (popularity/sql.py:313-326;
    * the reference recomputes this as a matview with a 21-day budget —
    * here it is one broadcast-join projection over the fact table).
    */
  val q12 = Q("q12_popularity_scores",
    (s, dir) => {
      val e = Tables(s, dir, "events")
      val consts = Popularity.constants(e, Seq("event_type"), "value", P)
      Popularity.score(e, consts, Seq("event_type"), "value")
        .select("event_id", "event_type", "value", "score")
    },
    Some("""
      WITH consts AS (
        SELECT event_type,
          ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(0.85 AS DOUBLE)) *
            (CASE WHEN pct <= CAST(0.0 AS DOUBLE) THEN CAST(1.0 AS DOUBLE) ELSE pct END) AS constant
        FROM (SELECT event_type,
                percentile_disc(0.85) WITHIN GROUP (ORDER BY value) AS pct
              FROM events GROUP BY event_type))
      SELECT e.event_id, e.event_type, e.value,
             e.value / (e.value + c.constant) AS score
      FROM events e LEFT JOIN consts c USING (event_type)"""))

  override def all: Seq[Q] = Seq(q10, q11, q12)
}
