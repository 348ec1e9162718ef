package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.operators.Maintenance
import org.apache.spark.sql.functions._

/** Maintenance one-shot coverage (reference `catalog/dags/maintenance/`).
  */
object MaintenanceQueries extends QueryPack {

  /** The add_license_url backfill (add_license_url.py:59-132): rows with
    * NULL meta_data get a license_url rebuilt from their (lowercased
    * license, version) pair via the reverse license map; unresolvable
    * pairs stay untouched. The synthesized table mixes uppercase
    * licenses (stored-uppercase CC0/PDM case), a bare "2" version (the
    * str(float) normalization path), valid pairs, rows that already
    * have meta_data, and an unknown license.
    */
  val q58 = Q("q58_license_backfill",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
      val idx = (col("doc_id") % 6 + 1).cast("int")
      val table = d.select(
        col("doc_id").as("identifier"),
        element_at(array(lit("by"), lit("BY-SA"), lit("CC0"), lit("by-nc"),
          lit("sampling+"), lit("wrong")), idx).as("license"),
        element_at(array(lit("4.0"), lit("2"), lit("1.0"), lit("3.0"),
          lit("1.0"), lit("1.0")), idx).as("license_version"),
        when(col("doc_id") % 3 === 0, lit(null).cast("map<string,string>"))
          .otherwise(map(lit("w"), lit("x"))).as("meta_data"))
      Maintenance.addLicenseUrl(table)
        .select(col("identifier"), col("license"), col("license_version"),
          element_at(col("meta_data"), "license_url").as("license_url"))
    },
    Some("""
      WITH t AS (SELECT doc_id AS identifier,
          CASE doc_id % 6 WHEN 0 THEN 'by' WHEN 1 THEN 'BY-SA'
            WHEN 2 THEN 'CC0' WHEN 3 THEN 'by-nc'
            WHEN 4 THEN 'sampling+' ELSE 'wrong' END AS license,
          CASE doc_id % 6 WHEN 0 THEN '4.0' WHEN 1 THEN '2'
            WHEN 3 THEN '3.0' ELSE '1.0' END AS license_version,
          (doc_id % 3 = 0) AS had_null
        FROM documents),
      r AS (SELECT t.*,
          CASE WHEN NOT had_null THEN NULL
               WHEN lower(license) = 'by' THEN 'https://creativecommons.org/licenses/by/4.0/'
               WHEN lower(license) = 'by-sa' THEN 'https://creativecommons.org/licenses/by-sa/2.0/'
               WHEN lower(license) = 'cc0' THEN 'https://creativecommons.org/publicdomain/zero/1.0/'
               WHEN lower(license) = 'by-nc' THEN 'https://creativecommons.org/licenses/by-nc/3.0/'
               WHEN lower(license) = 'sampling+' THEN 'https://creativecommons.org/licenses/sampling+/1.0/'
          END AS license_url
        FROM t)
      SELECT identifier,
             CASE WHEN license_url IS NOT NULL THEN lower(license)
                  ELSE license END AS license,
             license_version, license_url
      FROM r"""))

  /** Z-order (Morton) layout: lineitem clustered on
    * (l_partkey, l_suppkey) — the two-dimensional file-pruning layout a
    * 100 TB OPTIMIZE ZORDER rewrite would produce. The oracle computes
    * the identical interleave from the SAME (shift, mask) step table
    * rendered to SQL — single source of truth
    * ([[graft.operators.Layout.spreadSql]]).
    */
  // one constant drives BOTH the Spark plan and the oracle's shift —
  // editing either side alone can no longer break parity
  private val zBucketBits = 6

  val q77 = Q("q77_zorder",
    (s, dir) => graft.operators.Layout.zOrdered(
        Tables(s, dir, "lineitem"),
        col("l_partkey"), col("l_suppkey"), bucketBits = zBucketBits)
      .select(col("l_orderkey"), col("l_linenumber").cast("long")
          .as("l_linenumber"),
        col("z"), col("z_bucket")),
    Some(s"""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        ${graft.operators.Layout.zValueSql("l_partkey", "l_suppkey")} AS z,
        (${graft.operators.Layout.zValueSql("l_partkey", "l_suppkey")}
          >> ${32 - zBucketBits}) AS z_bucket
      FROM lineitem"""))

  private val profileCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
      "o_orderdate")

  /** Table profiling ([[graft.operators.Profile.table]]): the ANALYZE
    * pass — per-column row/non-null/exact-distinct counts plus min/max
    * (as strings), ONE scan for all columns via Spark's Expand. The
    * oracle is the per-column UNION ALL the single pass replaces.
    * Doubles are excluded by contract (engines disagree on float
    * rendering); everything else round-trips exactly.
    */
  val q90 = Q("q90_profile",
    (s, dir) => graft.operators.Profile.table(
      Tables(s, dir, "orders"), profileCols),
    Some(profileCols.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
        COUNT($c) AS n_nonnull, COUNT(DISTINCT $c) AS n_distinct,
        CAST(MIN($c) AS VARCHAR) AS min_val,
        CAST(MAX($c) AS VARCHAR) AS max_val FROM orders"""
    }.mkString(" UNION ALL ")))

  override def all: Seq[Q] = Seq(q58, q77, q90)
}
