package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.Column
import graft.functions.{CleanFunctions, Urls}
import org.apache.spark.sql.functions._

/** Record-cleaning operator coverage (SURVEY.md §2.2 P-family): string
  * sanitization, char limits, type coercions, overflow guards, filetype
  * normalization, tag pipelines, JSON field extraction. Messy inputs are
  * synthesized deterministically from the clean testdata so the oracle
  * can reproduce them.
  *
  * Coercion parity notes: Python `int(float(x))` truncates toward zero →
  * Spark `cast(double).cast(long)` truncates, but DuckDB `CAST(d AS
  * BIGINT)` ROUNDS — the oracle must TRUNC() first.
  */
object CleaningQueries extends QueryPack {

  /** P4/P5 — sanitize + truncate (columns.py:145-170). */
  val q17 = Q("q17_sanitize_strings",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
      val messy = concat(lit("  \"Title\"\t of:   "), col("text"),
        lit("   \u0008end  "))
      // the codegen'd single-pass expression (SanitizeStringExpr),
      // byte-identical to the regex chain the oracle mirrors
      val cleaned = CleanFunctions.sanitizeStringNative(messy)
      d.select(col("doc_id"),
        CleanFunctions.enforceCharLimit(cleaned, 80, truncate = true)
          .as("cleaned"),
        length(cleaned).cast("long").as("clen"))
    },
    Some("""
      WITH m AS (SELECT doc_id,
        trim(regexp_replace(regexp_replace(
          translate('  "Title"' || chr(9) || ' of:   ' || text || '   ' || chr(8) || 'end  ',
                    '"', ''''),
          '[\x08]', '', 'g'), '\s+', ' ', 'g')) AS cleaned
        FROM documents)
      SELECT doc_id,
             CASE WHEN length(cleaned) > 80 THEN substring(cleaned, 1, 80)
                  ELSE cleaned END AS cleaned,
             length(cleaned) AS clen
      FROM m"""))

  /** P6/P7/P14 — int coercion via double, bool coercion, 32-bit overflow
    * guard (columns.py:227-289, media.py:327-340).
    */
  val q18 = Q("q18_coercions",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val qtyStr = col("l_quantity").cast("string")
      val boolRaw = when(col("l_returnflag") === "R", lit("true"))
        .when(col("l_returnflag") === "A", lit("f"))
        .otherwise(lit("maybe"))
      val big = col("l_orderkey") * lit(1000000L)
      li.select(col("l_returnflag"),
          CleanFunctions.coerceInt(qtyStr).cast("long").as("qty_int"),
          CleanFunctions.coerceBool(boolRaw).as("flag_bool"),
          CleanFunctions.overflowGuard(big).as("guarded"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("qty_int")).as("sum_qty_int"),
          sum(when(col("flag_bool") === true, 1L).otherwise(0L)).as("n_true"),
          sum(when(col("flag_bool").isNull, 1L).otherwise(0L)).as("n_null_bool"),
          sum(when(col("guarded").isNull, 1L).otherwise(0L)).as("n_overflow"))
    },
    Some("""
      WITH c AS (SELECT l_returnflag,
          CAST(TRUNC(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE)) AS BIGINT) AS qty_int,
          CASE WHEN l_returnflag = 'R' THEN TRUE
               WHEN l_returnflag = 'A' THEN FALSE
               ELSE NULL END AS flag_bool,
          CASE WHEN l_orderkey * 1000000 >= 2147483647 THEN NULL
               ELSE l_orderkey * 1000000 END AS guarded
        FROM lineitem)
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(qty_int) AS BIGINT) AS sum_qty_int,
             CAST(SUM(CASE WHEN flag_bool = TRUE THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
             CAST(SUM(CASE WHEN flag_bool IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_bool,
             CAST(SUM(CASE WHEN guarded IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow
      FROM c GROUP BY l_returnflag"""))

  /** P13 — filetype extraction from URL + whitelist normalization
    * (media.py:313-325): jpeg→jpg, tif→tiff, unknown→null.
    */
  val q19 = Q("q19_filetype",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
      val ext = when(col("doc_id") % 6 === 0, "JPEG")
        .when(col("doc_id") % 6 === 1, "png")
        .when(col("doc_id") % 6 === 2, "TIF")
        .when(col("doc_id") % 6 === 3, "gif")
        .when(col("doc_id") % 6 === 4, "webp").otherwise("xyz")
      val url = concat(lit("https://img.example/f"),
        col("doc_id").cast("string"), lit("."), ext)
      d.select(col("doc_id"), url.as("url"),
        CleanFunctions.filetypeFromUrl(url,
          Seq("jpg", "png", "tiff", "gif", "webp")).as("filetype"))
    },
    Some("""
      WITH u AS (SELECT doc_id,
          'https://img.example/f' || doc_id || '.' ||
            CASE doc_id % 6 WHEN 0 THEN 'JPEG' WHEN 1 THEN 'png'
                 WHEN 2 THEN 'TIF' WHEN 3 THEN 'gif'
                 WHEN 4 THEN 'webp' ELSE 'xyz' END AS url
        FROM documents),
      e AS (SELECT doc_id, url,
          CASE lower(regexp_extract(url, '\.([a-zA-Z0-9]+)$', 1))
               WHEN 'jpeg' THEN 'jpg' WHEN 'tif' THEN 'tiff'
               ELSE lower(regexp_extract(url, '\.([a-zA-Z0-9]+)$', 1)) END AS norm
        FROM u)
      SELECT doc_id, url,
             CASE WHEN norm IN ('jpg','png','tiff','gif','webp') THEN norm
                  ELSE NULL END AS filetype
      FROM e"""))

  /** P10/A7/T2 — tag pipeline: blacklist filter, dedupe, sort, cap at 20,
    * join to display string (media.py:252-311 + taxa.sql:228-247).
    */
  val q20 = Q("q20_tag_pipeline",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
      val blacklist = Seq("the", "a", "of", "value")
      val tags = slice(array_sort(array_distinct(
        filter(split(col("text"), " "),
          t => !t.isin(blacklist: _*)))), 1, 20)
      d.select(col("doc_id"),
        array_join(tags, ", ").as("tags_str"),
        size(tags).cast("long").as("n_tags"))
    },
    Some("""
      WITH t AS (SELECT doc_id,
          list_sort(list_distinct(list_filter(string_split(text, ' '),
            x -> x NOT IN ('the','a','of','value'))))[1:20] AS tags
        FROM documents)
      SELECT doc_id, array_to_string(tags, ', ') AS tags_str,
             CAST(len(tags) AS BIGINT) AS n_tags
      FROM t"""))

  /** P24 — JSON field extract + cast, aggregated per group (the
    * meta_data->>metric core of popularity, popularity/sql.py:219-222).
    */
  val q21 = Q("q21_json_extract",
    (s, dir) => {
      val e = Tables(s, dir, "events")
      val k = get_json_object(col("props"), "$.k").cast("long")
      e.select(col("event_type"), k.as("k"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), max("k").as("max_k"),
          countDistinct(col("k")).as("n_distinct_k"))
    },
    Some("""
      SELECT event_type,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
             COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k
      FROM events GROUP BY event_type"""))

  /** P28 — URL component extraction (the Common Crawl link parse,
    * ExtractCCLinks.py:172-186): host / path / query via Spark's
    * parse_url (codegen'd built-in); the oracle mirrors with regexes and
    * NULLIF for parse_url's null-when-absent semantics.
    */
  val q42 = Q("q42_url_parse",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
      val url = concat(lit("https://"), col("source"),
        lit(".example.org/media/"), col("doc_id").cast("string"),
        when(col("doc_id") % 3 === 0, lit(""))
          .otherwise(concat(lit("?page="), (col("doc_id") % 7).cast("string"))))
      d.select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), col("url"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"))
    },
    Some("""
      WITH u AS (SELECT doc_id,
          'https://' || source || '.example.org/media/' || doc_id ||
            CASE WHEN doc_id % 3 = 0 THEN ''
                 ELSE '?page=' || (doc_id % 7) END AS url
        FROM documents)
      SELECT doc_id, url,
        regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
        NULLIF(regexp_extract(url, '\?([^#]*)', 1), '') AS query
      FROM u"""))

  /** P20 — first-value-by-name lookup in a key/value struct list (the
    * Wikimedia audio metadata shape, wikimedia_commons.py:431-452).
    */
  val q43 = Q("q43_kv_lookup",
    (s, dir) => {
      val e = Tables(s, dir, "events")
      val kv = array(
        struct(lit("kind").as("name"), col("event_type").as("value")),
        struct(lit("k").as("name"),
          get_json_object(col("props"), "$.k").as("value")),
        struct(lit("user").as("name"), col("user_id").cast("string")
          .as("value")))
      val lookup = (arr: Column, key: String) =>
        element_at(filter(arr, x => x.getField("name") === key), 1)
          .getField("value")
      e.select(col("event_id"), kv.as("kv"))
        .select(col("event_id"),
          lookup(col("kv"), "k").as("k_value"),
          lookup(col("kv"), "kind").as("kind_value"),
          lookup(col("kv"), "missing").as("missing_value"))
    },
    Some("""
      WITH kv AS (SELECT event_id,
          [{'name': 'kind', 'value': event_type},
           {'name': 'k', 'value': json_extract_string(props, '$.k')},
           {'name': 'user', 'value': CAST(user_id AS VARCHAR)}] AS arr
        FROM events)
      SELECT event_id,
        list_filter(arr, x -> x.name = 'k')[1].value AS k_value,
        list_filter(arr, x -> x.name = 'kind')[1].value AS kind_value,
        list_filter(arr, x -> x.name = 'missing')[1].value AS missing_value
      FROM kv"""))

  private val tlsInList =
    Urls.tlsSupportedDomains.map(d => s"'$d'").mkString(", ")

  /** P3 — URL validate/repair (`common/urls.py:20-59`): scheme
    * replace-with-best (frozen TLS map), protocol-relative fold,
    * slash strip, TLD-structure validation, IPv4 passthrough. The
    * fixture rows mirror the reference's own test_urls.py cases.
    */
  val q48 = Q("q48_url_validate",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
      val raw = when(col("doc_id") % 10 === 0, "creativecomons.org")
        .when(col("doc_id") % 10 === 1, "https:/abcd")
        .when(col("doc_id") % 10 === 2, "http://abcd.com")
        .when(col("doc_id") % 10 === 3, "8.8.8.8")
        .when(col("doc_id") % 10 === 4,
          "//commons.wikimedia.org/wiki/User:potato")
        .when(col("doc_id") % 10 === 5,
          "https://wordpress.org/photos/photo/5262839486/")
        .when(col("doc_id") % 10 === 6, "example.com:8080/gallery?id=1")
        .when(col("doc_id") % 10 === 7,
          "hreativecommons.org/?referer=https://abc.com")
        .when(col("doc_id") % 10 === 8, "")
        .otherwise("foo.notarealtld/x")
      d.select(col("doc_id"), raw.as("raw_url"),
        Urls.validateUrlString(raw).as("repaired_url"))
    },
    Some(s"""
      WITH u AS (SELECT doc_id,
          CASE doc_id % 10
            WHEN 0 THEN 'creativecomons.org'
            WHEN 1 THEN 'https:/abcd'
            WHEN 2 THEN 'http://abcd.com'
            WHEN 3 THEN '8.8.8.8'
            WHEN 4 THEN '//commons.wikimedia.org/wiki/User:potato'
            WHEN 5 THEN 'https://wordpress.org/photos/photo/5262839486/'
            WHEN 6 THEN 'example.com:8080/gallery?id=1'
            WHEN 7 THEN 'hreativecommons.org/?referer=https://abc.com'
            WHEN 8 THEN ''
            ELSE 'foo.notarealtld/x'
          END AS raw_url
        FROM documents),
      st AS (SELECT doc_id, raw_url,
          regexp_replace(trim(raw_url), '^https*:/*', '') AS noscheme
        FROM u),
      b AS (SELECT doc_id, raw_url,
          regexp_replace(noscheme, '^/+|/+$$', '', 'g') AS body,
          lower(regexp_extract(regexp_replace(noscheme, '^/+', ''),
            '^([^/:?#]+)', 1)) AS fq
        FROM st),
      c AS (SELECT doc_id, raw_url,
          concat(CASE WHEN fq IN ($tlsInList) THEN 'https' ELSE 'http' END,
            '://', body) AS upgraded
        FROM b),
      h AS (SELECT doc_id, raw_url, upgraded,
          lower(regexp_extract(upgraded, '^[a-z]+://([^/?#]+)', 1)) AS host
        FROM c)
      SELECT doc_id, raw_url,
        CASE WHEN trim(raw_url) = '' THEN NULL
             WHEN regexp_matches(host, '${Urls.hostPattern}')
               OR regexp_matches(host, '${Urls.ipv4Pattern}')
             THEN upgraded END AS repaired_url
      FROM h"""))

  /** P8 — JSON-value sanitization over typed collections: every map
    * value and array element goes through the P4 chain (the reference's
    * recursive `_sanitize_json_values` flattened onto typed columns);
    * array output serialized for the comparator.
    */
  val q50 = Q("q50_sanitize_json",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
      val m = map(
        lit("title"), concat(lit("  \"T\"\t "), substring(col("text"), 1, 30)),
        lit("note"), when(col("doc_id") % 4 === 0, lit(""))
          .otherwise(concat(lit(" a\u0008b  "), col("source"))))
      val arr = array(concat(lit("  x\t"), col("lang")), lit("\"q\""))
      val clean = CleanFunctions.sanitizeMapValues(m)
      d.select(col("doc_id"),
        element_at(clean, "title").as("title_clean"),
        element_at(clean, "note").as("note_clean"),
        array_join(CleanFunctions.sanitizeArrayValues(arr), "|")
          .as("arr_clean"))
    },
    Some("""
      WITH raw AS (SELECT doc_id,
          '  "T"' || chr(9) || ' ' || substring(text, 1, 30) AS title_v,
          CASE WHEN doc_id % 4 = 0 THEN ''
               ELSE ' a' || chr(8) || 'b  ' || source END AS note_v,
          '  x' || chr(9) || lang AS a0, '"q"' AS a1
        FROM documents)
      SELECT doc_id,
        trim(regexp_replace(regexp_replace(translate(title_v, '"', ''''),
          '[\x08]', '', 'g'), '\s+', ' ', 'g')) AS title_clean,
        trim(regexp_replace(regexp_replace(translate(note_v, '"', ''''),
          '[\x08]', '', 'g'), '\s+', ' ', 'g')) AS note_clean,
        trim(regexp_replace(regexp_replace(translate(a0, '"', ''''),
          '[\x08]', '', 'g'), '\s+', ' ', 'g')) || '|' ||
          trim(regexp_replace(regexp_replace(translate(a1, '"', ''''),
            '[\x08]', '', 'g'), '\s+', ' ', 'g')) AS arr_clean
      FROM raw"""))

  override def all: Seq[Q] =
    Seq(q17, q18, q19, q20, q21, q42, q43, q48, q50)
}
