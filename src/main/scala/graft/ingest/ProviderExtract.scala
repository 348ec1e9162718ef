package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{CleanFunctions, LicenseMap}

/** Provider API batch → normalized record extraction (SURVEY.md §2.1 S1
  * + §3.1). The HTTP pull itself is a driver-side fetcher writing raw
  * JSON batches to a landing zone; THIS is the Spark side: parse the
  * batch, project per-provider fields, and normalize through the shared
  * cleaning expressions — the columnar rewrite of the reference's
  * per-record Python (`flickr.py:220-269` get_record_data).
  *
  * One extractor per pagination archetype is enough to cover the
  * reference's 21 providers' record shapes; flickrish here models the
  * page-number style (largest-size coalesce P21, whitespace tag split
  * P18, HTML description strip P17, license URL resolution P2).
  */
object ProviderExtract {

  /** Schema of one flickr-style photo record inside a batch. */
  val flickrPhotoSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("owner", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("license_url", StringType),
    StructField("url_l", StringType),
    StructField("url_m", StringType),
    StructField("url_s", StringType),
    StructField("height_l", LongType),
    StructField("width_l", LongType),
    StructField("tags", StringType),
    StructField("views", LongType)))

  val flickrBatchSchema: StructType = StructType(Seq(
    StructField("page", LongType),
    StructField("pages", LongType),
    StructField("photo", ArrayType(flickrPhotoSchema))))

  /** Parse raw batch JSON strings (one API response per row) and emit
    * one normalized record per photo: explode the batch array (the
    * reference's one-response→many-records generator, §2.9), then pure
    * Column normalization.
    */
  def flickrish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    import spark.implicits._
    val parsed = rawBatches.select(
      from_json(col("value"), flickrBatchSchema).as("b"))
    val photos = parsed.select(explode(col("b.photo")).as("p"))
    val rec = photos.select(
      col("p.id").as("foreign_identifier"),
      concat(lit("https://www.flickr.com/photos/"), col("p.owner"),
        lit("/"), col("p.id")).as("foreign_landing_url"),
      coalesce(col("p.url_l"), col("p.url_m"), col("p.url_s")).as("url"),
      CleanFunctions.enforceCharLimit(
        CleanFunctions.sanitizeString(col("p.title")), 5000,
        truncate = true).as("title"),
      CleanFunctions.htmlToText(col("p.description")).as("description"),
      col("p.license_url").as("raw_license_url"),
      CleanFunctions.splitRawTags(col("p.tags")).as("tags"),
      col("p.views").as("views"),
      col("p.width_l").as("width"), col("p.height_l").as("height"),
      lit("flickr").as("provider"))
    // P2: resolve license, P1: required fields must survive
    LicenseMap.resolve(rec, "raw_license_url")
      .drop("license_path")
      .filter(col("foreign_identifier").isNotNull &&
        col("foreign_landing_url").isNotNull && col("url").isNotNull &&
        col("license").isNotNull)
  }

  /** One page record inside a wikimedia-style batch. */
  val wikiPageSchema: StructType = StructType(Seq(
    StructField("pageid", LongType),
    StructField("title", StringType),
    StructField("url", StringType),
    StructField("description_html", StringType),
    StructField("global_usage", LongType)))

  val wikiBatchSchema: StructType = StructType(Seq(
    StructField("continue_token", StringType),
    StructField("pages", ArrayType(wikiPageSchema))))

  /** Continue-token archetype (wikimedia_commons.py): the SAME page can
    * recur across consecutive batches with complementary fields (the
    * response-merge problem, wikimedia_commons.py:139-154) and varying
    * usage counts (the ST7 popularity cache) — so extraction is a
    * groupBy(pageid) merge: non-null field union via max, usage via
    * max, then normalization (File:-prefix title cleanup P19, HTML
    * description strip P17).
    */
  def wikimediaish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    val pages = rawBatches
      .select(from_json(col("value"), wikiBatchSchema).as("b"))
      .select(explode(col("b.pages")).as("p"))
      .select(col("p.*"))
      .filter(col("pageid").isNotNull)
    pages.groupBy("pageid")
      .agg(max(col("title")).as("title"),
        max(col("url")).as("url"),
        max(col("description_html")).as("description_html"),
        max(col("global_usage")).as("global_usage"))
      .select(
        col("pageid").cast("string").as("foreign_identifier"),
        CleanFunctions.cleanTitle(col("title")).as("title"),
        col("url"),
        CleanFunctions.htmlToText(col("description_html")).as("description"),
        col("global_usage"),
        lit("wikimedia").as("provider"))
  }

  // ---------------------------------------------------------------------
  // Archetype 3: offset pagination, audio records (jamendo.py /
  // europeana.py shape). Pagination state (`offset += batch_limit`,
  // jamendo.py:44-61) is driver-side planning; the Spark side is the
  // stateless batch → record explode + columnar normalization of
  // jamendo.py:180-243's per-record Python.
  // ---------------------------------------------------------------------

  val jamendoTrackSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("shareurl", StringType),
    StructField("audio", StringType),
    StructField("audiodownload", StringType),
    StructField("duration", LongType),
    StructField("license_ccurl", StringType),
    StructField("image", StringType),
    StructField("position", LongType),
    StructField("album_id", StringType),
    StructField("album_name", StringType),
    StructField("album_image", StringType),
    StructField("artist_id", StringType),
    StructField("artist_idstr", StringType),
    StructField("artist_name", StringType),
    StructField("releasedate", StringType),
    StructField("lyrics", StringType),
    StructField("musicinfo", StructType(Seq(
      StructField("speed", StringType),
      StructField("gender", StringType),
      StructField("vocalinstrumental", StringType),
      StructField("tags", StructType(Seq(
        StructField("genres", ArrayType(StringType)),
        StructField("instruments", ArrayType(StringType)),
        StructField("vartags", ArrayType(StringType)))))))),
    StructField("stats", StructType(Seq(
      StructField("rate_download_total", LongType),
      StructField("rate_listened_total", LongType),
      StructField("rate_playlisted_total", LongType))))))

  val jamendoBatchSchema: StructType = StructType(Seq(
    StructField("headers", StructType(Seq(
      StructField("results_count", LongType)))),
    StructField("results", ArrayType(jamendoTrackSchema))))

  /** Drop one query parameter from a URL, fixing separators — the
    * columnar form of `jamendo._remove_param_from_url:69-74` (used for
    * the `from` API-secret param and the audio-set `trackid`).
    *
    * Split-filter rather than regex so REPEATED parameters all drop
    * (`?a=1&a=2&b=3` → `?b=3`) and the `?` disappears with the last
    * pair, matching every case of the reference's parametrized table
    * (test_jamendo.py:34-48). Divergence beyond that table: the
    * reference round-trips through parse_qs/urlencode, which also
    * drops OTHER params' blank values and re-percent-encodes; this
    * keeps untouched parameters byte-identical instead — the safer
    * behavior for URLs that must keep working.
    */
  def removeUrlParam(url: Column, param: String): Column = {
    val parts = split(url, "\\?", 2)
    val base = element_at(parts, 1)
    val kept = filter(split(element_at(parts, 2), "&"),
      p => !p.startsWith(param + "=") && p =!= param)
    when(size(parts) < 2, url)
      .when(size(kept) > 0, concat(base, lit("?"), array_join(kept, "&")))
      .otherwise(base)
  }

  /** `jamendo._add_trailing_slash:99-111` — photon needs `/?`. */
  def addSlashBeforeQuery(url: Column): Column =
    when(url.isNotNull && !url.contains("/?"),
      regexp_replace(url, "\\?", "/?")).otherwise(url)

  /** Offset-pagination archetype (jamendo.py): explode `results`,
    * normalize columnar — strip the `from` secret off audio URLs,
    * photon-slash + de-trackid thumbnails, ms duration, ranked tag
    * assembly, audio-set subrecord with slugged set URL, license via
    * the frozen map, required-field drops.
    */
  def jamendoish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    val t = rawBatches
      .select(from_json(col("value"), jamendoBatchSchema).as("b"))
      .select(explode(col("b.results")).as("t"))
    val mi = col("t.musicinfo")
    val tags = concat(
      filter(array(
        mi.getField("vocalinstrumental"),
        mi.getField("gender"),
        when(mi.getField("speed").isNotNull,
          concat(lit("speed_"), mi.getField("speed")))),
        x => x.isNotNull),
      filter(coalesce(mi.getField("tags").getField("instruments"),
        array()), x => x =!= "undefined"),
      filter(coalesce(mi.getField("tags").getField("vartags"),
        array()), x => x =!= "undefined"))
    val stats = col("t.stats")
    val meta = map_filter(map(
      lit("lyrics"), nullif(col("t.lyrics"), lit("")),
      lit("release_date"), col("t.releasedate"),
      lit("downloads"), coalesce(stats.getField("rate_download_total"),
        lit(0L)).cast("string"),
      lit("listens"), coalesce(stats.getField("rate_listened_total"),
        lit(0L)).cast("string"),
      lit("playlists"), coalesce(stats.getField("rate_playlisted_total"),
        lit(0L)).cast("string")),
      (_, v) => v.isNotNull)
    // album slug: lower, spaces and slashes to dashes, then double
    // dashes removed (jamendo.py:216-219's exact replace chain)
    val slug = regexp_replace(
      translate(lower(col("t.album_name")), " /", "--"), "--", "")
    val setUrl = when(
      col("t.album_id").isNotNull && col("t.album_name").isNotNull,
      concat(lit("https://www.jamendo.com/album/"), col("t.album_id"),
        lit("/"), slug))
    val rec = t.select(
      col("t.id").as("foreign_identifier"),
      col("t.shareurl").as("foreign_landing_url"),
      removeUrlParam(col("t.audio"), "from").as("url"),
      (col("t.duration") * 1000).as("duration"),
      lit("mp32").as("filetype"),
      lit("music").as("category"),
      addSlashBeforeQuery(col("t.image")).as("thumbnail_url"),
      col("t.name").as("title"),
      when(col("t.artist_name").isNotNull, trim(col("t.artist_name")))
        .as("creator"),
      when(col("t.artist_name").isNotNull && col("t.artist_id").isNotNull
          && col("t.artist_idstr").isNotNull,
        concat(lit("https://www.jamendo.com/artist/"), col("t.artist_id"),
          lit("/"), col("t.artist_idstr"))).as("creator_url"),
      col("t.license_ccurl").as("raw_license_url"),
      meta.as("meta_data"),
      tags.as("tags"),
      mi.getField("tags").getField("genres").as("genres"),
      struct(
        col("t.album_id").as("set_foreign_id"),
        col("t.album_name").as("audio_set"),
        col("t.position").as("set_position"),
        setUrl.as("set_url"),
        removeUrlParam(addSlashBeforeQuery(col("t.album_image")),
          "trackid").as("set_thumbnail")).as("audio_set"),
      lit("jamendo").as("provider"))
    LicenseMap.resolve(rec, "raw_license_url")
      .drop("license_path")
      .filter(col("foreign_identifier").isNotNull &&
        col("foreign_landing_url").isNotNull && col("url").isNotNull &&
        col("license").isNotNull)
  }

  // ---------------------------------------------------------------------
  // Archetype 4: one response row → MANY image records (smithsonian.py:
  // 149-175 + 286-305) — the §2.9 table-generating case: each row's
  // online_media list fans out, each CC0 image inheriting the row's
  // shared fields.
  // ---------------------------------------------------------------------

  private val mediaItemSchema = StructType(Seq(
    StructField("content", StringType),
    StructField("idsId", StringType),
    StructField("thumbnail", StringType),
    StructField("type", StringType),
    StructField("usage", StructType(Seq(StructField("access", StringType))))))

  private val labeledContent = StructType(Seq(
    StructField("content", StringType),
    StructField("label", StringType)))

  val smithsonianRowSchema: StructType = StructType(Seq(
    StructField("content", StructType(Seq(
      StructField("descriptiveNonRepeating", StructType(Seq(
        StructField("record_link", StringType),
        StructField("guid", StringType),
        StructField("record_ID", StringType),
        StructField("unit_code", StringType),
        StructField("data_source", StringType),
        StructField("title", StructType(Seq(
          StructField("content", StringType)))),
        StructField("online_media", StructType(Seq(
          StructField("media", ArrayType(mediaItemSchema)))))))),
      StructField("freetext", StructType(Seq(
        StructField("name", ArrayType(labeledContent)),
        StructField("notes", ArrayType(labeledContent))))),
      StructField("indexedStructured", StructType(Seq(
        StructField("date", ArrayType(StringType)),
        StructField("object_type", ArrayType(StringType)),
        StructField("topic", ArrayType(StringType)),
        StructField("place", ArrayType(StringType)),
        StructField("name", ArrayType(StructType(Seq(
          StructField("content", StringType),
          StructField("type", StringType)))))))))))))

  val smithsonianBatchSchema: StructType = StructType(Seq(
    StructField("response", StructType(Seq(
      StructField("rowCount", LongType),
      StructField("rows", ArrayType(smithsonianRowSchema)))))))

  /** `smithsonian.creator_types:53-107` — label → preference rank. */
  val smithsonianCreatorTypes: Seq[(String, Int)] = Seq(
    "artist" -> 0, "artist/maker" -> 0, "attributed to" -> 0,
    "author" -> 0, "created_by" -> 0, "creator" -> 0, "created by" -> 0,
    "model maker" -> 0, "modeler" -> 0, "photographer" -> 0,
    "photograph by" -> 0, "written by" -> 0,
    "architect" -> 1, "designer" -> 1, "designed by" -> 1,
    "illustrator" -> 1, "illustrated by" -> 1, "cartoonist" -> 1,
    "weaver" -> 1, "composer" -> 1, "composed by" -> 1,
    "embroiderer" -> 1, "landscape architect" -> 1, "calligrapher" -> 1,
    "sculptor" -> 1, "jeweler" -> 1, "potter" -> 1, "ceramist" -> 1,
    "compiled by" -> 2, "engraver" -> 2, "etcher" -> 2, "maker" -> 2,
    "silversmith" -> 2, "producer" -> 2, "produced by" -> 2,
    "metal worker" -> 2, "carver" -> 2, "cartographer" -> 2,
    "print maker" -> 3, "painter" -> 3, "after" -> 3, "inventor" -> 3,
    "lithographer" -> 3, "attribution" -> 3, "former attribution" -> 3,
    "manufactured by" -> 4, "manufacturer" -> 4, "published by" -> 4,
    "publisher" -> 4, "editor" -> 4, "patentee" -> 5, "collector" -> 6)

  /** `smithsonian.description_types:54-63`. */
  val smithsonianDescriptionTypes: Seq[String] = Seq(
    "description", "summary", "caption", "notes", "description (brief)",
    "description (spanish)", "description (brief spanish)",
    "gallery label", "exhibition label", "luce center label",
    "publication label", "new acquisition label")

  /** `provider_details.SMITHSONIAN_SUB_PROVIDERS:71-117` flattened to
    * unit_code → source.
    */
  val smithsonianSubProviders: Seq[(String, String)] = {
    val nmnh = Seq("NMNHANTHRO", "NMNHBIRDS", "NMNHBOTANY",
      "NMNHEDUCATION", "NMNHENTO", "NMNHFISHES", "NMNHHERPS", "NMNHINV",
      "NMNHMAMMALS", "NMNHMINSCI", "NMNHPALEO")
      .map(_ -> "smithsonian_national_museum_of_natural_history")
    nmnh ++ Seq(
      "ACM" -> "smithsonian_anacostia_museum",
      "CHNDM" -> "smithsonian_cooper_hewitt_museum",
      "FBR" -> "smithsonian_field_book_project",
      "FSG" -> "smithsonian_freer_gallery_of_art",
      "HAC" -> "smithsonian_gardens",
      "OFEO-SG" -> "smithsonian_gardens",
      "HMSG" -> "smithsonian_hirshhorn_museum",
      "NASM" -> "smithsonian_air_and_space_museum",
      "NMAAHC" -> "smithsonian_african_american_history_museum",
      "NMAH" -> "smithsonian_american_history_museum",
      "NMAI" -> "smithsonian_american_indian_museum",
      "NMAfA" -> "smithsonian_african_art_museum",
      "NPG" -> "smithsonian_portrait_gallery",
      "NPM" -> "smithsonian_postal_museum",
      "NZP" -> "smithsonian_zoo_and_conservation",
      "SAAM" -> "smithsonian_american_art_museum",
      "SIA" -> "smithsonian_institution_archives",
      "SIL" -> "smithsonian_libraries")
  }

  private def litMap[V](entries: Seq[(String, V)]): Column =
    map(entries.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  /** Multi-record-per-response archetype (smithsonian.py): rows fan out
    * through TWO explodes — response rows, then each row's CC0 media
    * list — with shared row fields (title, landing URL, ranked creator,
    * notes-derived description, sub-provider lookup) inherited by every
    * image. All columnar; the rank-pick creator and description
    * concatenation are higher-order array expressions instead of the
    * reference's per-record loops.
    */
  def smithsonianish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    val rows = rawBatches
      .select(from_json(col("value"), smithsonianBatchSchema).as("b"))
      .select(explode(col("b.response.rows")).as("r"))
    val dnr = col("r.content.descriptiveNonRepeating")
    val ft = col("r.content.freetext")
    val ix = col("r.content.indexedStructured")

    val ctypes = litMap(smithsonianCreatorTypes)
    val candidates = filter(coalesce(ft.getField("name"), array()),
      x => element_at(ctypes, lower(x.getField("label"))).isNotNull &&
        x.getField("content").isNotNull &&
        !lower(x.getField("content")).contains("unknown"))
    val ranked = transform(candidates, x => struct(
      element_at(ctypes, lower(x.getField("label"))).as("rank"),
      x.getField("content").as("content")))
    val topRank = array_min(transform(ranked, x => x.getField("rank")))
    val topNames = transform(
      filter(ranked, x => x.getField("rank") === topRank),
      x => x.getField("content"))
    val freetextCreator = when(size(topNames) > 1,
      concat(array_join(slice(topNames, lit(1),
          (size(topNames) - 1).cast("int")), "; "),
        lit(" and "), element_at(topNames, -1)))
      .when(size(topNames) === 1, element_at(topNames, 1))
    val structuredCreator = element_at(transform(
      filter(coalesce(ix.getField("name"), array()),
        x => lower(x.getField("type")) === "personal_main" &&
          x.getField("content").isNotNull),
      x => x.getField("content")), 1)

    val dtypes = smithsonianDescriptionTypes.map(lit(_))
    val notes = coalesce(ft.getField("notes"), array())
    val description = array_join(transform(
      filter(notes, x =>
        lower(trim(x.getField("label"))).isInCollection(dtypes)),
      x => x.getField("content")), " ")
    val labelText = array_join(transform(
      filter(notes, x => lower(trim(x.getField("label"))) === "label text"),
      x => x.getField("content")), " ")

    val tags = concat(
      coalesce(ix.getField("date"), array()),
      coalesce(ix.getField("object_type"), array()),
      coalesce(ix.getField("topic"), array()),
      coalesce(ix.getField("place"), array()))

    val subProviders = litMap(smithsonianSubProviders)

    val shared = rows.select(
      coalesce(dnr.getField("record_link"), dnr.getField("guid"))
        .as("foreign_landing_url"),
      dnr.getField("title").getField("content").as("title"),
      element_at(subProviders, trim(dnr.getField("unit_code")))
        .as("source"),
      coalesce(freetextCreator, structuredCreator).as("creator"),
      map_filter(map(
        lit("unit_code"), dnr.getField("unit_code"),
        lit("data_source"), dnr.getField("data_source"),
        lit("description"), nullif(description, lit("")),
        lit("label_text"), nullif(labelText, lit(""))),
        (_, v) => v.isNotNull).as("meta_data"),
      filter(tags, x => x.isNotNull && x =!= "").as("tags"),
      coalesce(dnr.getField("online_media").getField("media"), array())
        .as("media"))
      .filter(col("foreign_landing_url").isNotNull)

    // the fan-out: one CC0 image record per qualifying media item
    shared
      .select(col("*"), explode(col("media")).as("m"))
      .filter(col("m.type") === "Images" &&
        col("m.usage.access") === "CC0" &&
        col("m.content").isNotNull && col("m.idsId").isNotNull)
      .select(
        col("m.idsId").as("foreign_identifier"),
        col("foreign_landing_url"),
        col("m.content").as("url"),
        col("m.thumbnail").as("thumbnail_url"),
        col("title"), col("creator"), col("source"),
        col("meta_data"), col("tags"),
        lit("cc0").as("license"), lit("1.0").as("license_version"),
        lit("smithsonian").as("provider"))
  }

  // ---------------------------------------------------------------------
  // Archetype 5: cursor pagination (europeana.py) — the response carries
  // a `nextCursor` the fetcher must thread into the next request
  // (europeana.py:205-218); batches are only usable when `success` is
  // true (europeana.py:220-226). The Spark side is the stateless
  // record-builder (EuropeanaRecordBuilder:55-160) gone columnar.
  // ---------------------------------------------------------------------

  val europeanaItemSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("guid", StringType),
    StructField("title", ArrayType(StringType)),
    StructField("rights", ArrayType(StringType)),
    StructField("edmIsShownAt", ArrayType(StringType)),
    StructField("edmIsShownBy", ArrayType(StringType)),
    StructField("country", ArrayType(StringType)),
    StructField("dataProvider", ArrayType(StringType)),
    StructField("dcDescription", ArrayType(StringType)),
    StructField("dcDescriptionLangAware", StructType(Seq(
      StructField("en", ArrayType(StringType)),
      StructField("def", ArrayType(StringType)))))))

  val europeanaBatchSchema: StructType = StructType(Seq(
    StructField("success", BooleanType),
    StructField("nextCursor", StringType),
    StructField("items", ArrayType(europeanaItemSchema))))

  /** `EUROPEANA_SUB_PROVIDERS` (provider_details.py:68): source keyed by
    * data-provider display name.
    */
  val europeanaSubProviders: Seq[(String, String)] =
    Seq("wellcome_collection" -> "Wellcome Collection")

  /** Per-batch continuation cursors (europeana.py:220-226
    * `get_should_continue`): the fetcher pages until nextCursor is null.
    */
  def europeanaNextCursors(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame =
    rawBatches.select(from_json(col("value"), europeanaBatchSchema).as("b"))
      .select(col("b.nextCursor").as("next_cursor"))

  /** Cursor-pagination archetype (europeana.py): failed responses are
    * dropped whole, items explode one record each. Field logic mirrors
    * EuropeanaRecordBuilder exactly: landing = edmIsShownAt[0] else
    * guid; url = edmIsShownBy[0]; the license URL is the first `rights`
    * entry containing "creativecommons"; the description prefers
    * lang-aware en → def → plain dcDescription, first entry trimmed
    * (europeana.py:139-160); meta_data keeps country/dataProvider as
    * typed arrays (the reference keeps the raw lists). Sub-provider
    * attribution checks dataProvider membership (the reference raises
    * on >1 eligible match — impossible with the current 1-entry map, so
    * the columnar form needs no error channel). `raise_if_empty`
    * becomes the trailing required-field filter (empty string and
    * empty-to-null coalescing included).
    */
  def europeanaish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    val items = rawBatches
      .select(from_json(col("value"), europeanaBatchSchema).as("b"))
      .filter(col("b.success") === true)
      .select(explode(col("b.items")).as("i"))
    val la = col("i.dcDescriptionLangAware")
    val langAware = when(size(la.getField("en")) > 0, la.getField("en"))
      .when(size(la.getField("def")) > 0, la.getField("def"))
    val descSource = when(size(langAware) > 0, langAware)
      .otherwise(col("i.dcDescription"))
    val description = when(size(descSource) > 0,
      trim(element_at(descSource, 1))).otherwise(lit(""))
    val ccRights = element_at(
      filter(col("i.rights"), r => r.contains("creativecommons")), 1)
    val subProv = europeanaSubProviders.foldLeft(lit("europeana")) {
      case (acc, (key, display)) =>
        when(array_contains(coalesce(col("i.dataProvider"),
          array().cast("array<string>")), display), lit(key)).otherwise(acc)
    }
    val rec = items.select(
      nullif(col("i.id"), lit("")).as("foreign_identifier"),
      nullif(coalesce(element_at(col("i.edmIsShownAt"), 1), col("i.guid")),
        lit("")).as("foreign_landing_url"),
      nullif(element_at(col("i.edmIsShownBy"), 1), lit("")).as("url"),
      nullif(element_at(col("i.title"), 1), lit("")).as("title"),
      struct(
        col("i.country").as("country"),
        col("i.dataProvider").as("dataProvider"),
        description.as("description")).as("meta_data"),
      subProv.as("source"),
      ccRights.as("raw_license_url"),
      lit("europeana").as("provider"))
    LicenseMap.resolve(rec, "raw_license_url")
      // canonical form of the matched path (LicenseInfo.url)
      .withColumn("license_url", when(col("license").isNotNull,
        concat(lit("https://creativecommons.org/"), col("license_path"),
          lit("/"))))
      .drop("license_path")
      .filter(col("foreign_identifier").isNotNull &&
        col("foreign_landing_url").isNotNull && col("url").isNotNull &&
        col("title").isNotNull && col("license").isNotNull)
  }

  // ---------------------------------------------------------------------
  // Archetype 6: page-number pagination, audio with alternate files
  // (freesound.py). Two record fields come from driver-side HTTP the
  // Spark engine cannot do (S2 boundary, like jamendo's offset state):
  // the preview's HEAD content-length (freesound.py:171-188) and the
  // pack endpoint's id/name (freesound.py:139-151, lru-cached) — the
  // fetcher stamps them into the landing-zone JSON as
  // `preview_filesize` / `pack_id` / `pack_name`.
  // ---------------------------------------------------------------------

  val freesoundPreviewsSchema: StructType = StructType(Seq(
    StructField("preview-hq-mp3", StringType),
    StructField("preview-lq-mp3", StringType),
    StructField("preview-hq-ogg", StringType),
    StructField("preview-lq-ogg", StringType)))

  val freesoundItemSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("url", StringType),
    StructField("name", StringType),
    StructField("tags", ArrayType(StringType)),
    StructField("description", StringType),
    StructField("license", StringType),
    StructField("type", StringType),
    StructField("download", StringType),
    StructField("filesize", LongType),
    StructField("bitrate", LongType),
    StructField("duration", DoubleType),
    StructField("samplerate", DoubleType),
    StructField("pack", StringType),
    StructField("username", StringType),
    StructField("num_downloads", LongType),
    StructField("avg_rating", DoubleType),
    StructField("num_ratings", LongType),
    StructField("geotag", StringType),
    StructField("previews", freesoundPreviewsSchema),
    StructField("preview_filesize", LongType),
    StructField("pack_id", StringType),
    StructField("pack_name", StringType)))

  val freesoundBatchSchema: StructType = StructType(Seq(
    StructField("count", LongType),
    StructField("next", StringType),
    StructField("results", ArrayType(freesoundItemSchema))))

  /** `freesound.preview_bitrates` (freesound.py:40-46). */
  val freesoundPreviewBitrate: Long = 128000L

  /** Page-number archetype with audio alt_files (freesound.py): the
    * hq-mp3 preview is the playable main file (filetype from the
    * preview key's last dash segment, fixed 128 kbps); the original
    * upload becomes ONE alt_file with kbps→bps bit_rate and truncated
    * sample rate (freesound.py:190-224). Records drop without a landing
    * url, id, resolvable CC license, hq-mp3 preview, or stamped preview
    * filesize — exactly the reference's early-return set
    * (freesound.py:226-253 + test_freesound.py's missing-field cases).
    * meta_data keeps only truthy values (_get_metadata:118-132): zero
    * counts and empty strings drop like Python falsy values.
    */
  def freesoundish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    val t = rawBatches
      .select(from_json(col("value"), freesoundBatchSchema).as("b"))
      .select(explode(col("b.results")).as("t"))
      // the API sometimes returns literal nulls in results
      // (freesound.py:104-108)
      .filter(col("t").isNotNull)
    val creator = trim(nullif(col("t.username"), lit("")))
    val meta = map_filter(map(
      lit("description"), nullif(col("t.description"), lit("")),
      lit("num_downloads"), when(col("t.num_downloads") =!= 0,
        col("t.num_downloads").cast("string")),
      lit("avg_rating"), when(col("t.avg_rating") =!= 0.0,
        col("t.avg_rating").cast("string")),
      lit("num_ratings"), when(col("t.num_ratings") =!= 0,
        col("t.num_ratings").cast("string")),
      lit("geotag"), nullif(col("t.geotag"), lit("")),
      lit("download"), nullif(col("t.download"), lit(""))),
      (_, v) => v.isNotNull)
    val rec = t.select(
      col("t.id").cast("string").as("foreign_identifier"),
      col("t.url").as("foreign_landing_url"),
      col("t.previews").getField("preview-hq-mp3").as("url"),
      lit("mp3").as("filetype"),
      lit(freesoundPreviewBitrate).as("bit_rate"),
      col("t.preview_filesize").as("filesize"),
      (col("t.duration") * 1000).cast("long").as("duration"),
      col("t.name").as("title"),
      creator.as("creator"),
      when(creator.isNotNull, concat(lit("https://freesound.org/people/"),
        creator, lit("/"))).as("creator_url"),
      col("t.license").as("raw_license_url"),
      meta.as("meta_data"),
      col("t.tags").as("tags"),
      struct(
        col("t.pack_id").as("set_foreign_id"),
        col("t.pack_name").as("audio_set"),
        col("t.pack").as("set_url")).as("audio_set"),
      array(struct(
        col("t.download").as("url"),
        (col("t.bitrate") * 1000).as("bit_rate"),
        col("t.samplerate").cast("long").as("sample_rate"),
        col("t.type").as("filetype"),
        col("t.filesize").as("filesize"))).as("alt_files"),
      lit("freesound").as("provider"))
    LicenseMap.resolve(rec, "raw_license_url")
      .withColumn("license_url", when(col("license").isNotNull,
        concat(lit("https://creativecommons.org/"), col("license_path"),
          lit("/"))))
      .drop("license_path")
      .filter(col("foreign_identifier").isNotNull &&
        col("foreign_landing_url").isNotNull && col("url").isNotNull &&
        col("license").isNotNull && col("filesize").isNotNull)
  }

  // ---------------------------------------------------------------------
  // Concrete page-number providers over the same machinery: nappy.py
  // (CC0-only, human-readable filesize strings) and cleveland_museum.py
  // (offset/skip pagination, best-available image preference).
  // ---------------------------------------------------------------------

  val nappyItemSchema: StructType = StructType(Seq(
    StructField("foreign_identifier", LongType),
    StructField("foreign_landing_url", StringType),
    StructField("url", StringType),
    StructField("filesize", StringType),
    StructField("filetype", StringType),
    StructField("creator", StringType),
    StructField("creator_url", StringType),
    StructField("title", StringType),
    StructField("tags", StringType),
    StructField("views", LongType),
    StructField("saves", LongType),
    StructField("downloads", LongType),
    StructField("width", LongType),
    StructField("height", LongType)))

  val nappyBatchSchema: StructType = StructType(Seq(
    StructField("images", ArrayType(nappyItemSchema)),
    StructField("next_page", StringType)))

  /** `nappy._convert_filesize:58-69` — "233.5kB" → 233500 bytes.
    * Python round() is banker's rounding → bround (HALF_EVEN);
    * unparsable numbers and unknown suffixes → null.
    */
  def nappyFilesize(raw: Column): Column = {
    val stripped = trim(raw)
    val mult = element_at(
      map(lit("kB"), lit(1000.0d), lit("MB"), lit(1000000.0d),
        lit("GB"), lit(1000000000.0d)),
      substring(stripped, -2, 2))
    val num = regexp_replace(stripped, "..$", "").cast("double")
    when(length(raw) > 2 && mult.isNotNull && num.isNotNull,
      bround(num * mult, 0).cast("long"))
  }

  /** Page-number provider, CC0-hardcoded (nappy.py): thumbnail is the
    * image URL with the resize query appended (nappy.py:81), filesize
    * parses from human-readable strings, meta_data carries the three
    * engagement counters verbatim (no truthiness filter —
    * nappy.py:88-92 keeps them unconditionally), raw tags split on
    * commas. Records need landing + image URLs (nappy.py:74-79).
    */
  def nappyish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    val t = rawBatches
      .select(from_json(col("value"), nappyBatchSchema).as("b"))
      .select(explode(col("b.images")).as("t"))
    t.select(
      col("t.foreign_identifier").cast("string").as("foreign_identifier"),
      col("t.foreign_landing_url").as("foreign_landing_url"),
      col("t.url").as("url"),
      concat(col("t.url"), lit("?auto=format&w=600&q=75"))
        .as("thumbnail_url"),
      nappyFilesize(col("t.filesize")).as("filesize"),
      col("t.filetype").as("filetype"),
      col("t.creator").as("creator"),
      col("t.creator_url").as("creator_url"),
      col("t.title").as("title"),
      map(lit("views"), col("t.views").cast("string"),
        lit("saves"), col("t.saves").cast("string"),
        lit("downloads"), col("t.downloads").cast("string"))
        .as("meta_data"),
      split(col("t.tags"), ",").as("tags"),
      col("t.width").as("width"), col("t.height").as("height"),
      lit("cc0").as("license"), lit("1.0").as("license_version"),
      lit("https://creativecommons.org/publicdomain/zero/1.0/")
        .as("license_url"),
      lit("nappy").as("provider"))
      .filter(col("foreign_landing_url").isNotNull && col("url").isNotNull)
  }

  private val clevelandImageSchema = StructType(Seq(
    StructField("url", StringType),
    StructField("width", StringType),
    StructField("height", StringType),
    StructField("filesize", StringType),
    StructField("filename", StringType)))

  val clevelandItemSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("url", StringType),
    StructField("title", StringType),
    StructField("share_license_status", StringType),
    StructField("accession_number", StringType),
    StructField("technique", StringType),
    StructField("creation_date", StringType),
    StructField("creditline", StringType),
    StructField("type", StringType),
    StructField("tombstone", StringType),
    StructField("culture", ArrayType(StringType)),
    StructField("creators", ArrayType(StructType(Seq(
      StructField("description", StringType))))),
    StructField("images", StructType(Seq(
      StructField("web", clevelandImageSchema),
      StructField("print", clevelandImageSchema),
      StructField("full", clevelandImageSchema))))))

  val clevelandBatchSchema: StructType = StructType(Seq(
    StructField("data", ArrayType(clevelandItemSchema))))

  /** `cleveland._get_int_value:90-103` — digit strings and ints pass,
    * anything else (including Python-falsy "" / 0) nulls out.
    */
  def clevelandInt(v: Column): Column =
    when(v.rlike("^[0-9]+$") && v =!= "0", v.cast("long"))

  /** Offset-pagination museum provider (cleveland_museum.py): CC0-only
    * (share_license_status lowercased gate), best-available image via
    * web → print → full preference (_get_image_data:74-85), int
    * coercion through the digit gate, creator from the first creators
    * entry defaulting to "" (cleveland_museum.py:56-59), meta_data
    * non-null-only with comma-joined culture.
    */
  def clevelandish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    val t = rawBatches
      .select(from_json(col("value"), clevelandBatchSchema).as("b"))
      .select(explode(col("b.data")).as("t"))
    val img = coalesce(col("t.images.web"), col("t.images.print"),
      col("t.images.full"))
    val meta = map_filter(map(
      lit("accession_number"), col("t.accession_number"),
      lit("technique"), col("t.technique"),
      lit("date"), col("t.creation_date"),
      lit("credit_line"), col("t.creditline"),
      lit("classification"), col("t.type"),
      lit("tombstone"), col("t.tombstone"),
      lit("culture"), nullif(array_join(
        filter(coalesce(col("t.culture"), array().cast("array<string>")),
          x => x.isNotNull), ","), lit(""))),
      (_, v) => v.isNotNull)
    t.filter(lower(coalesce(col("t.share_license_status"), lit(""))) === "cc0")
      .filter(col("t.id").isNotNull)
      .select(
        col("t.id").cast("string").as("foreign_identifier"),
        col("t.url").as("foreign_landing_url"),
        img.getField("url").as("url"),
        clevelandInt(img.getField("width")).as("width"),
        clevelandInt(img.getField("height")).as("height"),
        clevelandInt(img.getField("filesize")).as("filesize"),
        when(size(col("t.creators")) > 0,
          coalesce(element_at(col("t.creators"), 1).getField("description"),
            lit(""))).otherwise(lit("")).as("creator"),
        col("t.title").as("title"),
        meta.as("meta_data"),
        lit("cc0").as("license"), lit("1.0").as("license_version"),
        lit("clevelandmuseum").as("provider"))
      .filter(col("url").isNotNull)
  }

  // ---------------------------------------------------------------------
  // stocksnap.py: path-segment pagination (page number in the URL, not
  // a query param), CC0-hardcoded, title/slug synthesized from the
  // first two keywords. The image filesize is a driver-side HEAD
  // (stocksnap.py:153-158) stamped into the landing-zone JSON as
  // `filesize`, like freesound's preview_filesize.
  // ---------------------------------------------------------------------

  val stocksnapItemSchema: StructType = StructType(Seq(
    StructField("img_id", StringType),
    StructField("keywords", ArrayType(StringType)),
    StructField("author_name", StringType),
    StructField("author_website", StringType),
    StructField("author_profile", StringType),
    StructField("img_width", LongType),
    StructField("img_height", LongType),
    StructField("downloads_raw", LongType),
    StructField("page_views_raw", LongType),
    StructField("favorites_raw", LongType),
    StructField("filesize", LongType)))

  val stocksnapBatchSchema: StructType = StructType(Seq(
    StructField("nextPage", LongType),
    StructField("results", ArrayType(stocksnapItemSchema))))

  /** stocksnap.py records: foreign_landing_url is a slug of the first
    * two keywords plus the id (stocksnap.py:80-81), the image URL comes
    * off the fixed CDN (stocksnap.py:113-118), the title is the same
    * two keywords title-cased (required — no keywords, no record;
    * stocksnap.py:138-148), creator_url prefers the author's own site
    * unless it is one of the two placeholder profiles
    * (stocksnap.py:120-136), meta_data keeps the three counters when
    * present (zero INCLUDED — `is not None`, stocksnap.py:160-168).
    */
  def stocksnapish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    val t = rawBatches
      .select(from_json(col("value"), stocksnapBatchSchema).as("b"))
      .select(explode(col("b.results")).as("t"))
    val kw2 = slice(coalesce(col("t.keywords"),
      array().cast("array<string>")), 1, 2)
    val placeholderUrls = Seq("https://stocksnap.io/",
      "https://stocksnap.io/author/undefined/")
    val creatorUrl = when(col("t.author_name").isNull,
      lit(null).cast("string"))
      .when(col("t.author_website").isNull ||
        col("t.author_website").isin(placeholderUrls: _*),
        col("t.author_profile"))
      .otherwise(col("t.author_website"))
    t.select(
      col("t.img_id").as("foreign_identifier"),
      concat(lit("https://stocksnap.io/photo/"), array_join(kw2, "-"),
        lit("-"), col("t.img_id")).as("foreign_landing_url"),
      concat(lit("https://cdn.stocksnap.io/img-thumbs/960w/"),
        col("t.img_id"), lit(".jpg")).as("url"),
      when(size(kw2) > 0, initcap(array_join(kw2, " "))).as("title"),
      col("t.author_name").as("creator"),
      creatorUrl.as("creator_url"),
      col("t.filesize").as("filesize"),
      lit("jpg").as("filetype"),
      col("t.img_width").as("width"),
      col("t.img_height").as("height"),
      map_filter(map(
        lit("downloads_raw"), col("t.downloads_raw").cast("string"),
        lit("page_views_raw"), col("t.page_views_raw").cast("string"),
        lit("favorites_raw"), col("t.favorites_raw").cast("string")),
        (_, v) => v.isNotNull).as("meta_data"),
      col("t.keywords").as("tags"),
      lit("cc0").as("license"), lit("1.0").as("license_version"),
      lit("https://creativecommons.org/publicdomain/zero/1.0/")
        .as("license_url"),
      lit("stocksnap").as("provider"))
      .filter(col("foreign_identifier").isNotNull && col("title").isNotNull)
  }

  // ---------------------------------------------------------------------
  // museum_victoria.py: per-license query sweep driver-side; each object
  // row fans out one record per qualifying image in `media` (type ==
  // image, creativecommons licence, id + uri present), with the object's
  // landing page / title / metadata inherited — the smithsonian fan-out
  // pattern with per-IMAGE licensing.
  // ---------------------------------------------------------------------

  private val victoriaSizeSchema = StructType(Seq(
    StructField("uri", StringType),
    StructField("height", LongType),
    StructField("width", LongType),
    StructField("size", LongType)))

  val victoriaMediaSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("creators", ArrayType(StringType)),
    StructField("licence", StructType(Seq(
      StructField("uri", StringType)))),
    StructField("large", victoriaSizeSchema),
    StructField("medium", victoriaSizeSchema),
    StructField("small", victoriaSizeSchema)))

  val victoriaItemSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("displayTitle", StringType),
    StructField("dateModified", StringType),
    StructField("category", StringType),
    StructField("physicalDescription", StringType),
    StructField("keywords", ArrayType(StringType)),
    StructField("classifications", ArrayType(StringType)),
    StructField("media", ArrayType(victoriaMediaSchema))))

  /** museum_victoria.py record fan-out: objects dedupe on id first (the
    * reference's cross-page RECORDS_IDS set, museum_victoria.py:44-69 —
    * repeated API objects are identical payloads, so an id-distinct is
    * the columnar image), then one record per image with the
    * large → medium → small size preference (museum_victoria.py:124-137),
    * the licence gated on a creativecommons URI (167-172), creators
    * comma-joined when a list (139-144), and object metadata
    * non-null-filtered with comma-joined keyword/classification lists
    * (146-163).
    */
  def victoriaish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    val objects = rawBatches
      .select(from_json(col("value"), ArrayType(victoriaItemSchema)).as("b"))
      .select(explode(col("b")).as("o"))
      .select(col("o.*"))
      .dropDuplicates("id")
    val meta = map_filter(map(
      lit("datemodified"), col("dateModified"),
      lit("category"), col("category"),
      lit("description"), col("physicalDescription"),
      lit("keywords"), when(col("keywords").isNotNull,
        array_join(col("keywords"), ",")),
      lit("classifications"), when(col("classifications").isNotNull,
        array_join(col("classifications"), ","))),
      (_, v) => v.isNotNull)
    val fanned = objects
      .filter(col("media").isNotNull)
      .select(
        concat(lit("https://collections.museumsvictoria.com.au/"),
          col("id")).as("foreign_landing_url"),
        col("displayTitle").as("title"),
        meta.as("meta_data"),
        explode(col("media")).as("m"))
      .filter(col("m.type") === "image")
    val sized = coalesce(col("m.large"), col("m.medium"), col("m.small"))
    val rec = fanned.select(
      col("m.id").as("foreign_identifier"),
      col("foreign_landing_url"),
      sized.getField("uri").as("url"),
      sized.getField("height").as("height"),
      sized.getField("width").as("width"),
      when(col("m.creators").isNotNull,
        array_join(col("m.creators"), ",")).as("creator"),
      col("title"), col("meta_data"),
      when(col("m.licence.uri").contains("creativecommons"),
        col("m.licence.uri")).as("raw_license_url"),
      lit("museumsvictoria").as("provider"))
    LicenseMap.resolve(rec, "raw_license_url")
      .withColumn("license_url", when(col("license").isNotNull,
        concat(lit("https://creativecommons.org/"), col("license_path"),
          lit("/"))))
      .drop("license_path")
      .filter(col("foreign_identifier").isNotNull && col("url").isNotNull &&
        col("license").isNotNull)
  }

  // ---------------------------------------------------------------------
  // phylopic.py: build-token pagination (an initial request captures the
  // API `build` snapshot id + totalPages — both driver-side planner
  // state); HAL-style _links records with "WxH" size strings.
  // ---------------------------------------------------------------------

  private val phylopicLink = StructType(Seq(
    StructField("href", StringType),
    StructField("title", StringType),
    StructField("sizes", StringType)))

  val phylopicItemSchema: StructType = StructType(Seq(
    StructField("uuid", StringType),
    StructField("_links", StructType(Seq(
      StructField("license", phylopicLink),
      StructField("sourceFile", phylopicLink),
      StructField("self", phylopicLink),
      StructField("contributor", phylopicLink))))))

  val phylopicBatchSchema: StructType = StructType(Seq(
    StructField("build", LongType),
    StructField("totalPages", LongType),
    StructField("_embedded", StructType(Seq(
      StructField("items", ArrayType(phylopicItemSchema)))))))

  /** phylopic.py record extraction: uuid + the three required _links
    * hrefs (license, sourceFile, self — empty strings are Python-falsy
    * and drop, phylopic.py:96-105); landing and creator URLs are
    * host-prefixed relative hrefs; width/height parse from the "WxH"
    * sizes string through float (SVG sizes carry decimals) then
    * truncate (phylopic.py:76-84).
    */
  def phylopicish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    val host = "https://www.phylopic.org"
    val t = rawBatches
      .select(from_json(col("value"), phylopicBatchSchema).as("b"))
      .select(explode(col("b._embedded.items")).as("t"))
    val links = col("t._links")
    val sizes = links.getField("sourceFile").getField("sizes")
    val dims = split(sizes, "x")
    val hasDims = sizes.isNotNull && sizes.contains("x")
    val rec = t.select(
      nullif(col("t.uuid"), lit("")).as("foreign_identifier"),
      when(nullif(links.getField("self").getField("href"), lit(""))
        .isNotNull, concat(lit(host),
        links.getField("self").getField("href")))
        .as("foreign_landing_url"),
      nullif(links.getField("sourceFile").getField("href"), lit(""))
        .as("url"),
      links.getField("self").getField("title").as("title"),
      links.getField("contributor").getField("title").as("creator"),
      when(nullif(links.getField("contributor").getField("href"), lit(""))
        .isNotNull, concat(lit(host),
        links.getField("contributor").getField("href")))
        .as("creator_url"),
      when(hasDims, element_at(dims, 1).cast("double").cast("long"))
        .as("width"),
      when(hasDims, element_at(dims, 2).cast("double").cast("long"))
        .as("height"),
      nullif(links.getField("license").getField("href"), lit(""))
        .as("raw_license_url"),
      lit("phylopic").as("provider"))
    LicenseMap.resolve(rec, "raw_license_url")
      .withColumn("license_url", when(col("license").isNotNull,
        concat(lit("https://creativecommons.org/"), col("license_path"),
          lit("/"))))
      .drop("license_path")
      .filter(col("foreign_identifier").isNotNull &&
        col("foreign_landing_url").isNotNull && col("url").isNotNull &&
        col("raw_license_url").isNotNull && col("license").isNotNull)
  }

  // ---------------------------------------------------------------------
  // metropolitan_museum.py: the object-id list endpoint has no
  // pagination (one list per metadataDate); the driver fetches each
  // object document, and THIS side fans each public-domain object out
  // into one record per image (primary first, then additionalImages).
  // ---------------------------------------------------------------------

  val metObjectSchema: StructType = StructType(Seq(
    StructField("objectID", LongType),
    StructField("isPublicDomain", BooleanType),
    StructField("objectURL", StringType),
    StructField("primaryImage", StringType),
    StructField("additionalImages", ArrayType(StringType)),
    StructField("title", StringType),
    StructField("objectName", StringType),
    StructField("artistDisplayName", StringType),
    StructField("accessionNumber", StringType),
    StructField("department", StringType),
    StructField("medium", StringType),
    StructField("culture", StringType),
    StructField("classification", StringType),
    StructField("objectDate", StringType),
    StructField("creditLine", StringType),
    StructField("period", StringType),
    StructField("tags", ArrayType(StructType(Seq(
      StructField("term", StringType)))))))

  /** metropolitan_museum.py object → records: public-domain gate, one
    * record per truthy image URL with the primary image first
    * (metropolitan_museum.py:93-99), foreign id = objectID + the image
    * filename stem (135-137), title falls back from empty to objectName
    * (172-175), meta_data only when an accession number exists
    * (139-146), and the 9 descriptive fields + tag terms in order as
    * raw tags (148-170). CC0 hardcoded. Input rows are the
    * driver-fetched object documents.
    */
  def metish(spark: SparkSession, rawObjects: Dataset[String])
      : DataFrame = {
    val o = rawObjects
      .select(from_json(col("value"), metObjectSchema).as("o"))
      .select(col("o.*"))
    val images = filter(
      concat(array(col("primaryImage")),
        coalesce(col("additionalImages"), array().cast("array<string>"))),
      x => x.isNotNull && x =!= "")
    val tagFields = Seq("department", "medium", "culture", "objectName",
      "artistDisplayName", "classification", "objectDate", "creditLine",
      "period")
    val rawTags = concat(
      filter(array(tagFields.map(col): _*),
        x => x.isNotNull && x =!= ""),
      transform(coalesce(col("tags"),
        array().cast("array<struct<term:string>>")),
        t => t.getField("term")))
    o.filter(col("isPublicDomain") === true)
      .filter(col("objectURL").isNotNull && col("objectURL") =!= "")
      .withColumn("__img", explode(images))
      .select(
        concat(col("objectID").cast("string"), lit("-"),
          element_at(split(element_at(split(col("__img"), "/"), -1),
            "\\."), 1)).as("foreign_identifier"),
        col("objectURL").as("foreign_landing_url"),
        col("__img").as("url"),
        coalesce(nullif(col("title"), lit("")), col("objectName"))
          .as("title"),
        col("artistDisplayName").as("creator"),
        when(nullif(col("accessionNumber"), lit("")).isNotNull,
          map(lit("accession_number"), col("accessionNumber")))
          .as("meta_data"),
        rawTags.as("tags"),
        lit("cc0").as("license"), lit("1.0").as("license_version"),
        lit("https://creativecommons.org/publicdomain/zero/1.0/")
          .as("license_url"),
        lit("met").as("provider"))
  }

  // ---------------------------------------------------------------------
  // smk.py (National Gallery of Denmark): offset pagination; IIIF-or-
  // legacy image selection, English-site landing URLs built from
  // percent-encoded object numbers.
  // ---------------------------------------------------------------------

  val smkItemSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("object_number", StringType),
    StructField("rights", StringType),
    StructField("created", StringType),
    StructField("collection", ArrayType(StringType)),
    StructField("techniques", ArrayType(StringType)),
    StructField("colors", ArrayType(StringType)),
    StructField("titles", ArrayType(StructType(Seq(
      StructField("title", StringType))))),
    StructField("production", ArrayType(StructType(Seq(
      StructField("creator", StringType))))),
    StructField("image_iiif_id", StringType),
    StructField("image_native", StringType),
    StructField("image_thumbnail", StringType),
    StructField("image_height", LongType),
    StructField("image_width", LongType),
    StructField("image_size", LongType),
    StructField("size", LongType)))

  val smkBatchSchema: StructType = StructType(Seq(
    StructField("items", ArrayType(smkItemSchema))))

  /** smk.py records: IIIF-enabled images restrict to !2048 width
    * (smk._get_image_url:67-72); legacy items without an iiif id fall
    * back to the collection-DB id and the native image URL
    * (smk._get_images:91-122 — rows with neither id yield nothing);
    * the landing URL is the English site with the object number
    * percent-encoded (spaces — smk.py:50-64); meta_data keeps
    * created_date plus comma-joined list fields when present
    * (smk._get_metadata:124-138). The reference KEEPS records whose
    * rights URL does not resolve (get_license_info never returns None —
    * licenses.py:30-85), so unresolved licenses stay null here and the
    * store-level required-field filter drops them downstream.
    */
  def smkish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    val t = rawBatches
      .select(from_json(col("value"), smkBatchSchema).as("b"))
      .select(explode(col("b.items")).as("t"))
    val iiif = col("t.image_iiif_id")
    val imageId = coalesce(iiif, col("t.id"))
    val url = when(iiif.isNotNull,
      concat(iiif, lit("/full/!2048,/0/default.jpg")))
      .otherwise(col("t.image_native"))
    val landing = when(col("t.object_number").isNotNull &&
      col("t.object_number") =!= "",
      concat(lit("https://open.smk.dk/en/artwork/image/"),
        regexp_replace(col("t.object_number"), " ", "%20")))
    val meta = map_filter(map(
      lit("created_date"), col("t.created"),
      lit("collection"), when(col("t.collection").isNotNull,
        array_join(col("t.collection"), ",")),
      lit("techniques"), when(col("t.techniques").isNotNull,
        array_join(col("t.techniques"), ",")),
      lit("colors"), when(col("t.colors").isNotNull,
        array_join(col("t.colors"), ","))),
      (_, v) => v.isNotNull)
    val rec = t.filter(imageId.isNotNull).select(
      imageId.as("foreign_identifier"),
      landing.as("foreign_landing_url"),
      url.as("url"),
      col("t.image_thumbnail").as("thumbnail_url"),
      element_at(col("t.titles"), 1).getField("title").as("title"),
      element_at(col("t.production"), 1).getField("creator").as("creator"),
      col("t.image_height").as("height"),
      col("t.image_width").as("width"),
      coalesce(col("t.image_size"), col("t.size")).as("filesize"),
      meta.as("meta_data"),
      col("t.rights").as("raw_license_url"),
      lit("smk").as("provider"))
    LicenseMap.resolve(rec, "raw_license_url")
      .withColumn("license_url", when(col("license").isNotNull,
        concat(lit("https://creativecommons.org/"), col("license_path"),
          lit("/"))))
      .drop("license_path")
  }

  // ---------------------------------------------------------------------
  // brooklyn_museum.py: offset pagination; the license URL is embedded
  // in an HTML rights description and only counts when EXACTLY one CC
  // link is present; per-image size lookup against the declared largest
  // derivative.
  // ---------------------------------------------------------------------

  val brooklynImageSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("largest_derivative", StringType),
    StructField("largest_derivative_url", StringType),
    StructField("derivatives", ArrayType(StructType(Seq(
      StructField("height", LongType),
      StructField("width", LongType),
      StructField("size", StringType)))))))

  val brooklynObjectSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("accession_number", StringType),
    StructField("object_date", StringType),
    StructField("description", StringType),
    StructField("medium", StringType),
    StructField("credit_line", StringType),
    StructField("classification", StringType),
    StructField("artists", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("rank", LongType))))),
    StructField("rights_type", StructType(Seq(
      StructField("description", StringType)))),
    StructField("images", ArrayType(brooklynImageSchema))))

  /** `brooklyn._get_license_url:52-61` — href links are pulled from the
    * HTML rights description; a record is licensable only when EXACTLY
    * one creativecommons link appears (ambiguity means no license).
    */
  def brooklynLicenseUrl(rightsDescription: Column): Column = {
    val links = filter(
      regexp_extract_all(rightsDescription, lit("href=\"([^\"]*)\""), lit(1)),
      l => l.contains("https://creativecommons.org/"))
    when(size(links) === 1, element_at(links, 1))
  }

  /** brooklyn_museum.py object fan-out: one record per image carrying
    * an id and a largest-derivative URL (112-128); height/width come
    * from the derivative whose size tag matches the image's declared
    * `largest_derivative` (63-74); creator is the first rank-1 artist
    * (89-100); meta_data drops nulls (76-87). Objects without a clean
    * single CC link, an id, or any images yield nothing (139-153,
    * 104-110). Input rows are the driver-fetched object documents.
    */
  def brooklynish(spark: SparkSession, rawObjects: Dataset[String])
      : DataFrame = {
    val o = rawObjects
      .select(from_json(col("value"), brooklynObjectSchema).as("o"))
      .select(col("o.*"))
    val licenseUrl = brooklynLicenseUrl(col("rights_type.description"))
    val meta = map_filter(map(
      lit("accession_number"), col("accession_number"),
      lit("date"), col("object_date"),
      lit("description"), col("description"),
      lit("medium"), col("medium"),
      lit("credit_line"), col("credit_line"),
      lit("classification"), col("classification")),
      (_, v) => v.isNotNull)
    val creator = element_at(transform(
      filter(coalesce(col("artists"),
        array().cast(brooklynObjectSchema("artists").dataType)),
        a => a.getField("rank") === 1),
      a => a.getField("name")), 1)
    val rec = o
      .filter(col("id").isNotNull && col("id") =!= 0)
      .withColumn("__license_url", licenseUrl)
      .filter(col("__license_url").isNotNull)
      .filter(col("images").isNotNull)
      .select(col("*"), explode(col("images")).as("m"))
      .filter(col("m.id").isNotNull &&
        col("m.largest_derivative_url").isNotNull)
      .withColumn("__dims", element_at(filter(col("m.derivatives"),
        d => d.getField("size") === col("m.largest_derivative")), 1))
      .select(
        col("m.id").cast("string").as("foreign_identifier"),
        concat(lit("https://www.brooklynmuseum.org/opencollection/objects/"),
          col("id").cast("string")).as("foreign_landing_url"),
        col("m.largest_derivative_url").as("url"),
        col("__dims").getField("height").as("height"),
        col("__dims").getField("width").as("width"),
        coalesce(col("title"), lit("")).as("title"),
        creator.as("creator"),
        meta.as("meta_data"),
        col("__license_url").as("raw_license_url"),
        lit("brooklynmuseum").as("provider"))
    LicenseMap.resolve(rec, "raw_license_url")
      .withColumn("license_url", when(col("license").isNotNull,
        concat(lit("https://creativecommons.org/"), col("license_path"),
          lit("/"))))
      .drop("license_path")
      .filter(col("license").isNotNull)
  }

  // ---------------------------------------------------------------------
  // wordpress.py (WordPress Photo Directory): page-number pagination
  // bounded by a HEAD-derived X-WP-TotalPages (driver-side planner
  // state); CC0-fixed; embedded featured-media size preference and
  // term-taxonomy metadata.
  // ---------------------------------------------------------------------

  private val wpSizeSchema = StructType(Seq(
    StructField("source_url", StringType),
    StructField("height", LongType),
    StructField("width", LongType),
    StructField("filesize", LongType)))

  val wordpressItemSchema: StructType = StructType(Seq(
    StructField("slug", StringType),
    StructField("link", StringType),
    StructField("content", StructType(Seq(
      StructField("rendered", StringType)))),
    StructField("_embedded", StructType(Seq(
      StructField("author", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("slug", StringType),
        StructField("url", StringType),
        StructField("link", StringType))))),
      StructField("wp:featuredmedia", ArrayType(StructType(Seq(
        StructField("media_details", StructType(Seq(
          StructField("filesize", LongType),
          StructField("sizes", StructType(Seq(
            StructField("2048x2048", wpSizeSchema),
            StructField("1536x1536", wpSizeSchema),
            StructField("medium_large", wpSizeSchema),
            StructField("large", wpSizeSchema),
            StructField("full", wpSizeSchema)))),
          StructField("image_meta", StructType(Seq(
            StructField("aperture", StringType),
            StructField("camera", StringType),
            StructField("created_timestamp", StringType),
            StructField("focal_length", StringType),
            StructField("iso", StringType),
            StructField("shutter_speed", StringType))))))))))),
      StructField("wp:term", ArrayType(ArrayType(StructType(Seq(
        StructField("taxonomy", StringType),
        StructField("name", StringType)))))))))))

  /** wordpress.py records: slug + link required; the image comes from
    * the first preferred embedded size with a non-empty source_url
    * (2048 → 1536 → medium_large → large → full, wordpress.py:137-156),
    * full-size filesize read from media_details rather than the size
    * entry, zero filesizes nulled (the reference falls back to a HEAD
    * there); the title is the rendered content with HTML stripped
    * (lxml text_content → the shared html-to-text pass); author name
    * falls back to slug and url to link when empty (159-171); EXIF
    * extras keep non-empty values and the term taxonomies contribute
    * categories/colors/orientation metadata and photo_tag tags
    * (173-196) — typed as a struct (categories/colors are lists).
    */
  def wordpressish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    val t = rawBatches
      .select(from_json(col("value"),
        ArrayType(wordpressItemSchema)).as("b"))
      .select(explode(col("b")).as("t"))
    val emb = col("t._embedded")
    val md = element_at(emb.getField("wp:featuredmedia"), 1)
      .getField("media_details")
    val sizeNames = Seq("2048x2048", "1536x1536", "medium_large", "large",
      "full")
    val candidates = array(sizeNames.map { n =>
      val e = md.getField("sizes").getField(n)
      struct(
        e.getField("source_url").as("source_url"),
        e.getField("height").as("height"),
        e.getField("width").as("width"),
        (if (n == "full") md.getField("filesize")
         else e.getField("filesize")).as("filesize"))
    }: _*)
    val chosen = element_at(filter(candidates,
      c => c.getField("source_url").isNotNull &&
        c.getField("source_url") =!= ""), 1)
    val author = element_at(emb.getField("author"), 1)
    val terms = flatten(emb.getField("wp:term"))
    def termNames(taxonomy: String): Column = transform(
      filter(terms, x => x.getField("taxonomy") === taxonomy),
      x => x.getField("name"))
    val im = md.getField("image_meta")
    val metaStruct = struct(
      nullif(im.getField("aperture"), lit("")).as("aperture"),
      nullif(im.getField("camera"), lit("")).as("camera"),
      nullif(im.getField("created_timestamp"), lit(""))
        .as("created_timestamp"),
      nullif(im.getField("focal_length"), lit("")).as("focal_length"),
      nullif(im.getField("iso"), lit("")).as("iso"),
      nullif(im.getField("shutter_speed"), lit("")).as("shutter_speed"),
      element_at(termNames("photo_orientation"), 1).as("orientation"),
      termNames("photo_category").as("categories"),
      termNames("photo_color").as("colors"))
    t.select(
      col("t.slug").as("foreign_identifier"),
      col("t.link").as("foreign_landing_url"),
      chosen.getField("source_url").as("url"),
      chosen.getField("height").as("height"),
      chosen.getField("width").as("width"),
      nullif(chosen.getField("filesize"), lit(0L)).as("filesize"),
      when(nullif(col("t.content.rendered"), lit("")).isNotNull,
        CleanFunctions.htmlToText(col("t.content.rendered"))).as("title"),
      coalesce(nullif(author.getField("name"), lit("")),
        author.getField("slug")).as("creator"),
      coalesce(nullif(author.getField("url"), lit("")),
        author.getField("link")).as("creator_url"),
      metaStruct.as("meta_data"),
      termNames("photo_tag").as("tags"),
      lit("cc0").as("license"), lit("1.0").as("license_version"),
      lit("https://creativecommons.org/publicdomain/zero/1.0/")
        .as("license_url"),
      lit("wordpress").as("provider"))
      .filter(col("foreign_identifier").isNotNull &&
        col("foreign_landing_url").isNotNull && col("url").isNotNull)
  }

  // ---------------------------------------------------------------------
  // finnish_museums.py: time-delineated dated sweeps per building
  // (driver-side — the TimeDelineatedProviderDataIngester splits a day
  // into up to 20 timestamp slices when counts exceed thresholds; our
  // IngestPlanner owns slicing); status-gated batches; multi-image
  // records with Finnish-deed license URL normalization.
  // ---------------------------------------------------------------------

  private val finnishAuthorMap =
    MapType(StringType, StructType(Seq(
      StructField("role", ArrayType(StringType)))))

  val finnishRecordSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("imageRights", StructType(Seq(
      StructField("link", StringType)))),
    // the API sends {} (dict keyed by author name) OR [] for empty;
    // the list shape fails the map parse and nulls out — exactly the
    // reference's `type(author) != dict` skip (finnish_museums.py:166-178)
    StructField("authors", StructType(Seq(
      StructField("primary", finnishAuthorMap),
      StructField("secondary", finnishAuthorMap),
      StructField("corporate", finnishAuthorMap)))),
    StructField("buildings", ArrayType(StructType(Seq(
      StructField("value", StringType))))),
    StructField("images", ArrayType(StringType)),
    StructField("subjects", ArrayType(ArrayType(StringType)))))

  val finnishBatchSchema: StructType = StructType(Seq(
    StructField("status", StringType),
    StructField("resultCount", LongType),
    StructField("records", ArrayType(finnishRecordSchema))))

  /** `FINNISH_SUB_PROVIDERS` (provider_details.py:39-44). */
  val finnishSubProviders: Seq[(String, String)] = Seq(
    "national_museum_of_finland" -> "0/Suomen kansallismuseo/",
    "finnish_heritage_agency" -> "0/Museovirasto/",
    "finnish_satakunnan_museum" -> "0/SATMUSEO/",
    "finnish_military_museum" -> "0/SA-kuva/")

  /** finnish_museums.py records: batches count only when status is OK
    * (finnish_museums.py:99-108); the license link is required with the
    * Finnish deed suffix stripped (147-156); one record per image path,
    * host-prefixed (158-163); creator joins author-name KEYS per author
    * type with "; " (165-178); source attributes the first building
    * against the sub-provider map (120-124); tags flatten the nested
    * subject lists (126-129).
    */
  def finnishish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    val t = rawBatches
      .select(from_json(col("value"), finnishBatchSchema).as("b"))
      .filter(lower(col("b.status")) === "ok")
      .select(explode(col("b.records")).as("t"))
    val licenseUrl = regexp_replace(col("t.imageRights.link"),
      "deed\\.fi$", "")
    val auth = col("t.authors")
    val authorParts = filter(array(
      Seq("primary", "secondary", "corporate").map { ty =>
        when(auth.getField(ty).isNotNull,
          array_join(map_keys(auth.getField(ty)), "; "))
      }: _*), x => x.isNotNull)
    val creator = nullif(array_join(authorParts, "; "), lit(""))
    val building = element_at(col("t.buildings"), 1).getField("value")
    val source = finnishSubProviders.foldLeft(lit("finnishmuseums")) {
      case (acc, (key, value)) =>
        when(lit(value).contains(building), lit(key)).otherwise(acc)
    }
    val rec = t
      .filter(col("t.id").isNotNull &&
        nullif(col("t.imageRights.link"), lit("")).isNotNull)
      .select(
        col("t.id").as("foreign_identifier"),
        concat(lit("https://www.finna.fi/Record/"), col("t.id"))
          .as("foreign_landing_url"),
        col("t.title").as("title"),
        creator.as("creator"),
        source.as("source"),
        when(col("t.subjects").isNotNull, flatten(col("t.subjects")))
          .as("tags"),
        licenseUrl.as("raw_license_url"),
        explode(col("t.images")).as("img"))
      .withColumn("url", concat(lit("https://api.finna.fi"), col("img")))
      .drop("img")
      .withColumn("provider", lit("finnishmuseums"))
    LicenseMap.resolve(rec, "raw_license_url")
      .withColumn("license_url", when(col("license").isNotNull,
        concat(lit("https://creativecommons.org/"), col("license_path"),
          lit("/"))))
      .drop("license_path")
      .filter(col("license").isNotNull)
  }

  // ---------------------------------------------------------------------
  // science_museum.py: year-range sweeps (driver-side planner state —
  // the API 400s past page 50, so ranges shrink toward the present);
  // per-image "CC XX N.N" usage-terms parsing; pixel-unit dimension
  // extraction.
  // ---------------------------------------------------------------------

  private val scienceImageSchema = StructType(Seq(
    StructField("location", StringType),
    StructField("format", StringType),
    StructField("measurements", StructType(Seq(
      StructField("dimensions", ArrayType(StructType(Seq(
        StructField("dimension", StringType),
        StructField("units", StringType),
        StructField("value", LongType))))))))))

  val scienceRecordSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("links", StructType(Seq(
      StructField("self", StringType)))),
    StructField("attributes", StructType(Seq(
      StructField("summary_title", StringType),
      StructField("lifecycle", StructType(Seq(
        StructField("creation", ArrayType(StructType(Seq(
          StructField("maker", ArrayType(StructType(Seq(
            StructField("summary_title", StringType)))))))))))),
      StructField("identifier", ArrayType(StructType(Seq(
        StructField("value", StringType))))),
      StructField("name", ArrayType(StructType(Seq(
        StructField("value", StringType))))),
      StructField("categories", ArrayType(StructType(Seq(
        StructField("value", StringType))))),
      StructField("description", ArrayType(StructType(Seq(
        StructField("value", StringType))))),
      StructField("legal", StructType(Seq(
        StructField("credit_line", StringType)))),
      StructField("multimedia", ArrayType(StructType(Seq(
        StructField("admin", StructType(Seq(
          StructField("uid", StringType)))),
        StructField("processed", StructType(Seq(
          StructField("large", scienceImageSchema),
          StructField("medium", scienceImageSchema)))),
        StructField("source", StructType(Seq(
          StructField("legal", StructType(Seq(
            StructField("rights", ArrayType(StructType(Seq(
              StructField("usage_terms", StringType))))))))))))))))))))

  val scienceBatchSchema: StructType = StructType(Seq(
    StructField("data", ArrayType(scienceRecordSchema))))

  /** science_museum.py record fan-out: records dedupe on id (the
    * RECORD_IDS set), need a self link, attributes and multimedia
    * (science_museum.py:110-127); each media item needs an admin uid, a
    * large-else-medium processed image whose relative location prefixes
    * onto the images CDN (176-212), and a parseable "CC XX N.N" usage
    * terms — lowercased, the leading cc stripped, exactly one space
    * between license and version or the image is skipped (243-257);
    * dimensions only count in pixel units, last entry per dimension
    * name winning (183-198); meta_data takes the first value of each
    * list attribute plus the credit line (215-241); the creator is the
    * first maker of the first creation (164-173).
    */
  def sciencemuseumish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    val recs = rawBatches
      .select(from_json(col("value"), scienceBatchSchema).as("b"))
      .select(explode(col("b.data")).as("t"))
      .select(col("t.*"))
      .dropDuplicates("id")
    val a = col("attributes")
    def firstValue(key: String): Column =
      element_at(a.getField(key), 1).getField("value")
    val meta = map_filter(map(
      lit("accession number"), firstValue("identifier"),
      lit("name"), firstValue("name"),
      lit("category"), firstValue("categories"),
      lit("description"), firstValue("description"),
      lit("creditline"), a.getField("legal").getField("credit_line")),
      (_, v) => v.isNotNull)
    val creator = element_at(
      element_at(a.getField("lifecycle").getField("creation"), 1)
        .getField("maker"), 1).getField("summary_title")
    val fanned = recs
      .filter(col("links.self").isNotNull && a.isNotNull)
      .select(
        col("links.self").as("foreign_landing_url"),
        a.getField("summary_title").as("title"),
        creator.as("creator"),
        meta.as("meta_data"),
        explode(a.getField("multimedia")).as("m"))
    val img = coalesce(col("m.processed.large"), col("m.processed.medium"))
    val loc = img.getField("location")
    val url = when(loc.isNull || loc === "", lit(null).cast("string"))
      .when(loc.startsWith("http"), loc)
      .otherwise(concat(
        lit("https://coimages.sciencemuseumgroup.org.uk/images/"), loc))
    val dims = img.getField("measurements").getField("dimensions")
    def pixelDim(name: String): Column = {
      val last = element_at(filter(dims,
        d => d.getField("dimension") === name), -1)
      when(last.getField("units") === "pixels", last.getField("value"))
    }
    val terms = lower(element_at(
      col("m.source.legal.rights"), 1).getField("usage_terms"))
    val stripped = regexp_replace(terms, "^cc[ -]", "")
    val pairOk = nullif(stripped, lit("")).isNotNull &&
      size(split(stripped, " ", -1)) === 2
    val rec = fanned
      .filter(col("m.admin.uid").isNotNull && url.isNotNull && pairOk)
      .select(
        col("m.admin.uid").as("foreign_identifier"),
        col("foreign_landing_url"),
        url.as("url"),
        pixelDim("height").as("height"),
        pixelDim("width").as("width"),
        img.getField("format").as("filetype"),
        element_at(split(stripped, " ", -1), 1).as("license"),
        element_at(split(stripped, " ", -1), 2).as("license_version"),
        col("title"), col("creator"), col("meta_data"),
        lit("sciencemuseum").as("provider"))
    LicenseMap.resolvePair(rec, "license", "license_version")
      .drop("license_version_n", "license_path")
  }

  // ---------------------------------------------------------------------
  // rawpixel.py: HMAC-signed search requests (the signature is fetcher
  // state — rawpixel.py:85-127); style-URI templated image sizes;
  // marketing-suffix title/description scrubbing.
  // ---------------------------------------------------------------------

  val rawpixelItemSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("url", StringType),
    StructField("artist_names", StringType),
    StructField("name_ext", StringType),
    StructField("download_count", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("display_image_width", LongType),
    StructField("display_image_height", LongType),
    StructField("style_uri", StringType),
    StructField("metadata", StructType(Seq(
      StructField("licenseUrl", StringType),
      StructField("title", StringType),
      StructField("description_text", StringType),
      StructField("popular_keywords", ArrayType(StringType)))))))

  val rawpixelBatchSchema: StructType = StructType(Seq(
    StructField("total", LongType),
    StructField("results", ArrayType(rawpixelItemSchema))))

  /** The documented subset of html.unescape the rawpixel titles actually
    * carry (rawpixel.py:171-186's examples); extend as new entities
    * appear in fixtures.
    */
  private def htmlUnescapeLite(c: Column): Column = {
    val entities = Seq("&ndash;" -> "–", "&mdash;" -> "—",
      "&Eacute;" -> "É", "&eacute;" -> "é",
      "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ")
    entities.foldLeft(c) { case (acc, (e, ch)) =>
      regexp_replace(acc, e, ch)
    }
  }

  /** `rawpixel._clean_text:164-178`: strip, full marketing-suffix
    * removal, partial-suffix removal, HTML unescape, strip, trailing
    * comma removal.
    */
  def rawpixelCleanText(c: Column): Column = {
    val t1 = regexp_replace(trim(c),
      "(?i)(?:Free public domain CC0 (?:image|photo)|Digitally enhanced by rawpixel)[.,!?]?$",
      "")
    val t2 = regexp_replace(t1,
      "(?i)(?:free ?|original ?)?(?:public(?: domain(?: CC0 (?:image|photo))?)?)?[.,!?]?$",
      "")
    regexp_replace(trim(htmlUnescapeLite(t2)), ",$", "")
  }

  /** rawpixel.py records: id, landing url, metadata and a resolvable
    * license required (rawpixel.py:246-262); the image URL formats the
    * style_uri template with the 1300-width option (129-152); width and
    * height take the max of raw and display values, (0, 0) meaning
    * unknown (154-161); the title drops the "| Free Photo - rawpixel"
    * tail then the marketing suffixes and trailing period (180-201);
    * meta_data keeps the scrubbed description and the download count
    * (203-213); the creator drops the "(Source)" suffix (215-219);
    * tags exclude license-y keywords and the category derives from
    * keyword membership (221-244).
    */
  def rawpixelish(spark: SparkSession, rawBatches: Dataset[String])
      : DataFrame = {
    val t = rawBatches
      .select(from_json(col("value"), rawpixelBatchSchema).as("b"))
      .select(explode(col("b.results")).as("t"))
    val m = col("t.metadata")
    val wv = greatest(coalesce(col("t.width"), lit(0L)),
      coalesce(col("t.display_image_width"), lit(0L)))
    val hv = greatest(coalesce(col("t.height"), lit(0L)),
      coalesce(col("t.display_image_height"), lit(0L)))
    val unknownDims = wv === 0 && hv === 0
    val titleBase = trim(element_at(split(m.getField("title"), "\\|", 2), 1))
    val title = nullif(regexp_replace(rawpixelCleanText(titleBase),
      "\\.$", ""), lit(""))
    val description = nullif(
      rawpixelCleanText(coalesce(m.getField("description_text"), lit(""))),
      lit(""))
    val kw = m.getField("popular_keywords")
    val tags = filter(coalesce(kw, array().cast("array<string>")),
      k => !(k.contains("cc0") || k.contains("creative commons") ||
        k.contains("public domain")))
    val category = when(array_contains(kw, "public domain art"),
        lit("digitized_artwork"))
      .when(array_contains(kw, "image") || array_contains(kw, "photo"),
        lit("photograph"))
      .when(array_contains(kw, "clipart"), lit("illustration"))
    val rec = t
      .filter(col("t.id").isNotNull && col("t.id") =!= 0 &&
        nullif(col("t.url"), lit("")).isNotNull && m.isNotNull &&
        nullif(col("t.style_uri"), lit("")).isNotNull)
      .select(
        col("t.id").cast("string").as("foreign_identifier"),
        col("t.url").as("foreign_landing_url"),
        regexp_replace(col("t.style_uri"), "\\{\\}", "image_1300").as("url"),
        when(unknownDims, lit(null).cast("long")).otherwise(wv).as("width"),
        when(unknownDims, lit(null).cast("long")).otherwise(hv).as("height"),
        title.as("title"),
        map_filter(map(
          lit("description"), description,
          lit("download_count"), col("t.download_count").cast("string")),
          (_, v) => v.isNotNull).as("meta_data"),
        tags.as("tags"),
        nullif(trim(regexp_replace(coalesce(col("t.artist_names"), lit("")),
          "\\(Source\\)$", "")), lit("")).as("creator"),
        col("t.name_ext").as("filetype"),
        category.as("category"),
        m.getField("licenseUrl").as("raw_license_url"),
        lit("rawpixel").as("provider"))
    LicenseMap.resolve(rec, "raw_license_url")
      .withColumn("license_url", when(col("license").isNotNull,
        concat(lit("https://creativecommons.org/"), col("license_path"),
          lit("/"))))
      .drop("license_path")
      .filter(col("license").isNotNull)
  }

  // ---------------------------------------------------------------------
  // nypl.py: per-item metadata documents (driver fetches item_details
  // per search uuid) in XML-converted JSON where many fields are
  // dict-OR-list. The columnar translation parses the document TWICE —
  // once with list-shaped fields, once with dict-shaped — and
  // coalesces per extracted value (from_json yields partial results,
  // nulling only the mismatched field). The rarely-seen subject-as-dict
  // shape is not modeled.
  // ---------------------------------------------------------------------

  private val nyplDollar = StructType(Seq(StructField("$", StringType)))

  private val nyplCaptureSchema = StructType(Seq(
    StructField("imageID", nyplDollar),
    StructField("itemLink", nyplDollar),
    StructField("rightsStatementURI", nyplDollar),
    StructField("imageLinks", StructType(Seq(
      StructField("imageLink", ArrayType(StructType(Seq(
        StructField("$", StringType),
        StructField("description", StringType))))))))))

  private def nyplModsSchema(listShaped: Boolean): StructType = {
    def poly(inner: DataType): DataType =
      if (listShaped) ArrayType(inner) else inner
    StructType(Seq(
      StructField("titleInfo", poly(StructType(Seq(
        StructField("title", nyplDollar))))),
      StructField("name", poly(StructType(Seq(
        StructField("usage", StringType),
        StructField("namePart", nyplDollar))))),
      StructField("typeOfResource", poly(StructType(Seq(
        StructField("usage", StringType),
        StructField("$", StringType))))),
      StructField("genre", nyplDollar),
      StructField("originInfo", StructType(Seq(
        StructField("dateIssued", nyplDollar),
        StructField("dateCreated", poly(StructType(Seq(
          StructField("point", StringType),
          StructField("$", StringType))))),
        StructField("publisher", nyplDollar)))),
      StructField("physicalDescription", StructType(Seq(
        StructField("note", nyplDollar)))),
      StructField("subject", ArrayType(StructType(Seq(
        StructField("topic", poly(nyplDollar))))))))
  }

  private def nyplItemSchema(listShaped: Boolean): StructType =
    StructType(Seq(StructField("nyplAPI", StructType(Seq(
      StructField("response", StructType(Seq(
        StructField("mods", nyplModsSchema(listShaped)),
        StructField("sibling_captures", StructType(Seq(
          StructField("capture",
            if (listShaped) ArrayType(nyplCaptureSchema)
            else nyplCaptureSchema))))))))))))

  /** The size preference over the image URL's `t` query parameter,
    * largest first (nypl.py:54-58).
    */
  val nyplImageDimensions: Seq[String] = Seq("g", "v", "q", "w", "r")

  /** nypl.py item documents → one record per sibling capture: the image
    * is the largest available `t` dimension with the download query
    * stripped (nypl.py:168-198), filetype parsed from the link
    * description (" .jpeg "/" .gif ", 147-160); captures need an
    * imageID, an image link, an item link and a rights URI
    * (118-134); the creator is the primary name's namePart (200-206),
    * the title the first titleInfo's (96-101); meta_data mirrors
    * _get_metadata (218-273: primary type_of_resource, genre,
    * date_issued, dict-or-approximate-range date_created, publisher,
    * physical-description note, comma-joined subject topics); category
    * is photograph only for the Photographs genre (108-111).
    */
  def nyplish(spark: SparkSession, rawItems: Dataset[String]): DataFrame = {
    val parsed = rawItems.select(
      from_json(col("value"), nyplItemSchema(true)).as("L"),
      from_json(col("value"), nyplItemSchema(false)).as("D"))
    val mL = col("L.nyplAPI.response.mods")
    val mD = col("D.nyplAPI.response.mods")
    val title = when(
      mL.getField("titleInfo").isNull && mD.getField("titleInfo").isNull,
      lit("")).otherwise(coalesce(
      element_at(mL.getField("titleInfo"), 1)
        .getField("title").getField("$"),
      mD.getField("titleInfo").getField("title").getField("$")))
    val creator = coalesce(
      element_at(transform(filter(mL.getField("name"),
        n => n.getField("usage") === "primary"),
        n => n.getField("namePart").getField("$")), 1),
      when(mD.getField("name").getField("usage") === "primary",
        mD.getField("name").getField("namePart").getField("$")))
    val typeOfResource = coalesce(
      element_at(transform(filter(mL.getField("typeOfResource"),
        t => t.getField("usage") === "primary"),
        t => t.getField("$")), 1),
      mD.getField("typeOfResource").getField("$"))
    val oiL = mL.getField("originInfo")
    val dcList = oiL.getField("dateCreated")
    val dcStart = element_at(transform(filter(dcList,
      d => d.getField("point") === "start"), d => d.getField("$")), 1)
    val dcEnd = element_at(transform(filter(dcList,
      d => d.getField("point") === "end"), d => d.getField("$")), 1)
    val dateCreated = coalesce(
      when(dcStart.isNotNull, concat(dcStart,
        when(dcEnd.isNotNull, concat(lit("-"), dcEnd)).otherwise(lit("")))),
      mD.getField("originInfo").getField("dateCreated").getField("$"))
    // topic is dict-or-list PER SUBJECT: the list shape comes from the
    // L parse, the dict shape from D (filter/transform of a null array
    // stay null, so the absent variant simply drops out)
    val topicsL = flatten(transform(
      filter(mL.getField("subject"), s => s.getField("topic").isNotNull),
      s => transform(s.getField("topic"), t => t.getField("$"))))
    val topicsD = transform(
      filter(mD.getField("subject"), s => s.getField("topic").isNotNull),
      s => s.getField("topic").getField("$"))
    val tags = nullif(array_join(coalesce(
      when(size(topicsL) > 0, topicsL),
      when(size(topicsD) > 0, topicsD)), ", "), lit(""))
    val meta = map_filter(map(
      lit("type_of_resource"), typeOfResource,
      lit("genre"), mL.getField("genre").getField("$"),
      lit("date_issued"), oiL.getField("dateIssued").getField("$"),
      lit("date_created"), dateCreated,
      lit("publisher"), oiL.getField("publisher").getField("$"),
      lit("physical_description"),
      mL.getField("physicalDescription").getField("note").getField("$"),
      lit("tags"), tags),
      (_, v) => v.isNotNull)
    val category = when(
      mL.getField("genre").getField("$") === "Photographs",
      lit("photograph"))
    val captures = coalesce(
      col("L.nyplAPI.response.sibling_captures.capture"),
      array(col("D.nyplAPI.response.sibling_captures.capture")))
    val fanned = parsed.select(
      title.as("title"), creator.as("creator"), meta.as("meta_data"),
      category.as("category"), explode(captures).as("c"))
    val links = col("c.imageLinks.imageLink")
    // per dimension: the LAST link carrying t=<dim> (dict-comprehension
    // last-wins), overall preferring the largest dimension
    val chosen = coalesce(nyplImageDimensions.map { dim =>
      element_at(filter(links,
        l => l.getField("$").rlike(s"[?&]t=$dim(&|$$)")), -1)
    }: _*)
    fanned
      .filter(col("c.imageID.$").isNotNull)
      .filter(chosen.isNotNull)
      .filter(nullif(col("c.itemLink.$"), lit("")).isNotNull &&
        col("c.rightsStatementURI.$").isNotNull)
      .select(
        col("c.imageID.$").as("foreign_identifier"),
        col("c.itemLink.$").as("foreign_landing_url"),
        regexp_replace(chosen.getField("$"), "&download=1", "").as("url"),
        nullif(regexp_extract(chosen.getField("description"),
          " .(jpeg|gif) ", 1), lit("")).as("filetype"),
        col("title"), col("creator"), col("meta_data"), col("category"),
        col("c.rightsStatementURI.$").as("raw_license_url"),
        lit("nypl").as("provider"))
      .transform(LicenseMap.resolve(_, "raw_license_url"))
      .withColumn("license_url", when(col("license").isNotNull,
        concat(lit("https://creativecommons.org/"), col("license_path"),
          lit("/"))))
      .drop("license_path")
  }
}
