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

  /** Per-group equi-depth histogram: quartile cutpoints from ONE
    * [[Popularity.percentileDiscMulti]] pass (exact percentile_disc,
    * value-typed so comparisons are engine-exact), then bucket counts
    * from a broadcast join of the |groups|×3 cutoff table back against
    * the fact scan — the ANALYZE histogram a cost-based optimizer
    * feeds on, built without ever sorting the fact table globally.
    */
  val q98 = Q("q98_equidepth_hist",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("v"))
      val cuts = Popularity.percentileDiscMulti(li, Seq("flag"), "v",
          Seq(0.25, 0.5, 0.75))
        .select(col("flag"), col("pct0").as("c1"), col("pct1").as("c2"),
          col("pct2").as("c3"))
      li.join(broadcast(cuts), "flag")
        .withColumn("bucket",
          (col("v") > col("c1")).cast("int") +
            (col("v") > col("c2")).cast("int") +
            (col("v") > col("c3")).cast("int"))
        .groupBy("flag", "bucket")
        .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
    },
    Some("""
      WITH li AS (SELECT l_returnflag AS flag,
                    CAST(l_quantity AS BIGINT) AS v FROM lineitem),
      cuts AS (SELECT flag,
          percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS c1,
          percentile_disc(0.5)  WITHIN GROUP (ORDER BY v) AS c2,
          percentile_disc(0.75) WITHIN GROUP (ORDER BY v) AS c3
        FROM li GROUP BY flag)
      SELECT flag,
        CAST(v > c1 AS INT) + CAST(v > c2 AS INT) + CAST(v > c3 AS INT)
          AS bucket,
        COUNT(*) AS n, MIN(v) AS lo, MAX(v) AS hi
      FROM li JOIN cuts USING (flag)
      GROUP BY 1, 2"""))

  override def all: Seq[Q] = Seq(q10, q11, q12, q98)
}
