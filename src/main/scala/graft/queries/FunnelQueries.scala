package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.operators.{MediaClean, MergeUpsert, Popularity}
import graft.sources.Tsv
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** The composed end-to-end provider lifecycle — the reference's whole
  * load chain as ONE oracle-checked query (provider_dag_factory.py:199-297:
  * create loading table → TSV load → clean → dedupe/url-conflict → upsert
  * → popularity), mirroring loader/sql.py stage order:
  * required-field DELETEs (sql.py:214-219) → key dedup (sql.py:220-237) →
  * DISTINCT ON (url) (sql.py:319) → url-conflict anti-join
  * (sql.py:322-326) → ON CONFLICT upsert (sql.py:264-332) → popularity
  * refresh (popularity/sql.py:249-326).
  *
  * Every stage here is individually oracle-verified elsewhere
  * (q15/q16/q13/q10–q12); THIS query verifies their COMPOSITION —
  * column drift between stages is the bug class nothing else catches.
  * The staged batch genuinely round-trips through the TSV boundary
  * (Tsv.write → Tsv.read at the image v001 schema), so schema/typing
  * loss at the S5 boundary would break the hash match.
  */
object FunnelQueries extends QueryPack {

  private val P = 0.85

  val q57 = Q("q57_e2e_funnel",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
      val did = col("doc_id")
      val nullS = lit(null).cast("string")

      // --- the extraction stage's output, in TSV image-v001 shape.
      // Synthesized deterministically from `documents` so the DuckDB
      // oracle reproduces it exactly: null required fields (dropped by
      // P1), fid collisions (J8 work), url collisions (DISTINCT ON url
      // work), trailing slashes (media.py slash strip), sparse
      // category/source (defaulting work).
      val lic = when(did % 59 === 0, nullS).otherwise(element_at(
        array(lit("by"), lit("by-sa"), lit("by-nc-nd"), lit("cc0"),
          lit("pdm")), (did % 5 + 1).cast("int")))
      val batch = d.select(
        when(did % 53 === 0, nullS)
          .otherwise(concat(lit("f"), (did % 300).cast("string")))
          .as("foreign_identifier"),
        concat(lit("https://p/"), did.cast("string"),
          when(did % 7 === 0, lit("/")).otherwise(lit("")))
          .as("foreign_landing_url"),
        when(did % 47 === 0, nullS)
          .otherwise(concat(lit("https://img/"), (did % 350).cast("string"),
            lit(".jpg"))).as("url"),
        when(did % 9 === 0, nullS)
          .otherwise(concat(lit("https://t/"), did.cast("string")))
          .as("thumbnail_url"),
        lit("jpg").as("filetype"),
        ((did * 13) % 100000).cast("int").as("filesize"),
        lic.as("license_"),
        when(lic.isNull, nullS)
          .when(lic.isin("cc0", "pdm"), lit("1.0")).otherwise(lit("4.0"))
          .as("license_version"),
        concat(lit("c"), (did % 13).cast("string")).as("creator"),
        concat(lit("https://c/"), (did % 13).cast("string"),
          when(did % 11 === 0, lit("/")).otherwise(lit(""))).as("creator_url"),
        // unique per row and ordered like doc_id: the deterministic
        // dedup tiebreaker that survives the TSV boundary
        concat(lit("T "), lpad(did.cast("string"), 8, "0")).as("title"),
        when(did % 2 === 0, concat(
          lit("{\"license_url\":\"https://creativecommons.org/licenses/by/4.0/\",\"w\":\""),
          (did % 3).cast("string"), lit("\"}"))).otherwise(nullS)
          .as("meta_data"),
        nullS.as("tags"),
        when(did % 2 === 0, nullS).otherwise(lit("photograph")).as("category"),
        lit("f").as("watermarked"),
        lit("funnelprov").as("provider"),
        when(did % 4 === 0, nullS).otherwise(element_at(
          array(lit("stocksnap"), lit("phylopic"), lit("met")),
          (did % 3 + 1).cast("int"))).as("source"),
        lit("provider_api").as("ingestion_type"),
        ((did % 1920) + 1).cast("int").as("width"),
        ((did % 1080) + 1).cast("int").as("height"))

      // --- S4/S5: through the TSV boundary for real
      val tsvDir = "/tmp/graft_q57_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      Tsv.write(batch, tsvDir)
      val loaded = Tsv.read(s, tsvDir)

      // --- typing at the load boundary: JSON meta_data → map, license
      // URLs surfaced as columns (media.py keeps them in meta_data on
      // the TSV; clean_media_metadata expects them as columns)
      val typed = loaded
        .withColumn("meta_data",
          from_json(col("meta_data"), MapType(StringType, StringType)))
        .withColumn("license_url", element_at(col("meta_data"), "license_url"))
        .withColumn("raw_license_url",
          element_at(col("meta_data"), "raw_license_url"))
        .withColumnRenamed("license_", "license")

      // --- P1–P16 one-pass clean (provider stamp, source/category
      // defaults, slash strip, license URLs folded into meta_data,
      // required-field drops)
      val cleaned = MediaClean.cleanMediaMetadata(typed, "funnelprov")
        .select(col("provider"), col("foreign_identifier"),
          col("foreign_landing_url"), col("url"), col("thumbnail_url"),
          col("license"), col("license_version"), col("creator"),
          col("title"), col("meta_data"), col("category"), col("source"),
          col("filesize"))

      // --- the live table (a previous load's survivors), key- and
      // url-unique like the real table's indexes require
      val target = d.filter(did % 4 === 0 && did < 300).select(
        lit("funnelprov").as("provider"),
        concat(lit("f"), did.cast("string")).as("foreign_identifier"),
        concat(lit("https://p/"), did.cast("string"))
          .as("foreign_landing_url"),
        concat(lit("https://img/"), (did % 350).cast("string"), lit(".jpg"))
          .as("url"),
        concat(lit("https://t/"), did.cast("string")).as("thumbnail_url"),
        lit("by").as("license"),
        lit("4.0").as("license_version"),
        concat(lit("c"), (did % 13).cast("string")).as("creator"),
        concat(lit("T old "), did.cast("string")).as("title"),
        map(lit("license_url"),
          lit("https://creativecommons.org/licenses/by/4.0/old"))
          .as("meta_data"),
        lit("photograph").as("category"),
        lit("oldsource").as("source"),
        ((did * 7) % 90000).cast("int").as("filesize"))

      // --- J8/J9 → DISTINCT ON url → J7 → J6 → A1–A3
      val fidDeduped = MergeUpsert.dedupeByKey(cleaned,
        Seq(col("provider"), md5(col("foreign_identifier"))), col("title"))
      val urlDeduped = MergeUpsert.dedupeByKey(fidDeduped,
        Seq(col("url")), col("title"))
      val conflictFree = MergeUpsert.urlConflictFilter(urlDeduped, target,
        "url", "foreign_identifier")
      val merged = MergeUpsert.merge(target, conflictFree,
        Seq("provider", "foreign_identifier"))
      val consts = Popularity.constants(merged, Seq("provider"),
        "filesize", P)
      Popularity.score(merged, consts, Seq("provider"), "filesize")
        .select(col("provider"), col("foreign_identifier"), col("url"),
          col("foreign_landing_url"), col("thumbnail_url"), col("title"),
          col("creator"), col("category"), col("license"),
          col("license_version"), col("source"),
          element_at(col("meta_data"), "license_url").as("license_url"),
          col("filesize").cast("long").as("filesize"), col("score"))
    },
    Some("""
      WITH batch AS (
        SELECT doc_id,
          CASE WHEN doc_id % 53 = 0 THEN NULL ELSE 'f' || (doc_id % 300) END AS foreign_identifier,
          'https://p/' || doc_id || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END) AS foreign_landing_url,
          CASE WHEN doc_id % 47 = 0 THEN NULL ELSE 'https://img/' || (doc_id % 350) || '.jpg' END AS url,
          CASE WHEN doc_id % 9 = 0 THEN NULL ELSE 'https://t/' || doc_id END AS thumbnail_url,
          (doc_id * 13) % 100000 AS filesize,
          CASE WHEN doc_id % 59 = 0 THEN NULL ELSE
            CASE doc_id % 5 WHEN 0 THEN 'by' WHEN 1 THEN 'by-sa' WHEN 2 THEN 'by-nc-nd' WHEN 3 THEN 'cc0' ELSE 'pdm' END
          END AS license,
          CASE WHEN doc_id % 59 = 0 THEN NULL
               WHEN doc_id % 5 IN (3, 4) THEN '1.0' ELSE '4.0' END AS license_version,
          'c' || (doc_id % 13) AS creator,
          'T ' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS title,
          CASE WHEN doc_id % 2 = 0 THEN 'https://creativecommons.org/licenses/by/4.0/' END AS license_url,
          CASE WHEN doc_id % 2 = 0 THEN NULL ELSE 'photograph' END AS category,
          CASE WHEN doc_id % 4 = 0 THEN NULL ELSE
            CASE doc_id % 3 WHEN 0 THEN 'stocksnap' WHEN 1 THEN 'phylopic' ELSE 'met' END
          END AS source
        FROM documents),
      cleaned AS (
        SELECT 'funnelprov' AS provider,
          foreign_identifier,
          regexp_replace(foreign_landing_url, '/+$', '') AS foreign_landing_url,
          url,
          thumbnail_url,
          license, license_version, creator, title, license_url,
          COALESCE(category, CASE COALESCE(source, 'funnelprov')
            WHEN 'stocksnap' THEN 'photograph'
            WHEN 'phylopic' THEN 'illustration'
            WHEN 'met' THEN 'digitized_artwork' END) AS category,
          COALESCE(source, 'funnelprov') AS source,
          filesize
        FROM batch
        WHERE foreign_identifier IS NOT NULL AND foreign_landing_url IS NOT NULL
          AND url IS NOT NULL AND license IS NOT NULL),
      fidded AS (
        SELECT * FROM (SELECT *, row_number() OVER (
            PARTITION BY provider, md5(foreign_identifier) ORDER BY title) AS rn
          FROM cleaned) WHERE rn = 1),
      urled AS (
        SELECT * FROM (SELECT *, row_number() OVER (
            PARTITION BY url ORDER BY title) AS rn2
          FROM fidded) WHERE rn2 = 1),
      target AS (
        SELECT 'funnelprov' AS provider, 'f' || doc_id AS foreign_identifier,
          'https://p/' || doc_id AS foreign_landing_url,
          'https://img/' || (doc_id % 350) || '.jpg' AS url,
          'https://t/' || doc_id AS thumbnail_url,
          'by' AS license, '4.0' AS license_version,
          'c' || (doc_id % 13) AS creator, 'T old ' || doc_id AS title,
          'https://creativecommons.org/licenses/by/4.0/old' AS license_url,
          'photograph' AS category, 'oldsource' AS source,
          (doc_id * 7) % 90000 AS filesize
        FROM documents WHERE doc_id % 4 = 0 AND doc_id < 300),
      nonconflict AS (
        SELECT s.* FROM urled s WHERE NOT EXISTS (
          SELECT 1 FROM target t
          WHERE t.url = s.url
            AND md5(t.foreign_identifier) <> md5(s.foreign_identifier))),
      merged AS (
        SELECT COALESCE(t.provider, s.provider) AS provider,
          COALESCE(t.foreign_identifier, s.foreign_identifier) AS foreign_identifier,
          COALESCE(s.foreign_landing_url, t.foreign_landing_url) AS foreign_landing_url,
          COALESCE(s.url, t.url) AS url,
          COALESCE(s.thumbnail_url, t.thumbnail_url) AS thumbnail_url,
          COALESCE(s.license, t.license) AS license,
          COALESCE(s.license_version, t.license_version) AS license_version,
          COALESCE(s.creator, t.creator) AS creator,
          COALESCE(s.title, t.title) AS title,
          CASE WHEN s.foreign_identifier IS NOT NULL THEN s.license_url
               ELSE t.license_url END AS license_url,
          COALESCE(s.category, t.category) AS category,
          COALESCE(s.source, t.source) AS source,
          COALESCE(s.filesize, t.filesize) AS filesize
        FROM target t FULL JOIN nonconflict s
          ON t.provider = s.provider
         AND t.foreign_identifier = s.foreign_identifier),
      consts AS (
        SELECT provider,
          ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(0.85 AS DOUBLE)) *
            (CASE WHEN pct <= CAST(0.0 AS DOUBLE) THEN CAST(1.0 AS DOUBLE) ELSE pct END) AS constant
        FROM (SELECT provider,
                percentile_disc(0.85) WITHIN GROUP (ORDER BY filesize) AS pct
              FROM merged GROUP BY provider))
      SELECT m.provider, m.foreign_identifier, m.url, m.foreign_landing_url,
             m.thumbnail_url, m.title, m.creator, m.category, m.license,
             m.license_version, m.source, m.license_url,
             CAST(m.filesize AS BIGINT) AS filesize,
             m.filesize / (m.filesize + c.constant) AS score
      FROM merged m LEFT JOIN consts c USING (provider)"""))

  override def all: Seq[Q] = Seq(q57)
}
