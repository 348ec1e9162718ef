package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.CleanFunctions

/** The MediaStore's `clean_media_metadata` (reference
  * `storage/media.py:116-160`) as ONE columnar pass over a record
  * frame: provider stamping, source defaulting, per-source category
  * defaulting, license URLs folded into meta_data then dropped as
  * columns, optional trailing-slash strip on every URL column, and
  * required-field enforcement. The reference raises per record; the
  * engine drops the row (quarantine-able via
  * MergeUpsert.missingCounts), which is the only batch-sane form.
  */
object MediaClean {

  /** `provider_details.DEFAULT_IMAGE_CATEGORY:142-162`. */
  val defaultImageCategory: Seq[(String, String)] = Seq(
    "stocksnap" -> "photograph",
    "animaldiversity" -> "photograph",
    "brooklynmuseum" -> "digitized_artwork",
    "capl" -> "photograph",
    "clevelandmuseum" -> "digitized_artwork",
    "deviantart" -> "digitized_artwork",
    "digitaltmuseum" -> "digitized_artwork",
    "floraon" -> "photograph",
    "inaturalist" -> "photograph",
    "mccordmuseum" -> "digitized_artwork",
    "met" -> "digitized_artwork",
    "museumsvictoria" -> "digitized_artwork",
    "nappy" -> "photograph",
    "phylopic" -> "illustration",
    "rijksmuseum" -> "digitized_artwork",
    "sciencemuseum" -> "photograph",
    "svgsilh" -> "illustration",
    "thorvaldsenmuseum" -> "digitized_artwork",
    "worms" -> "photograph")

  private val categoryMap: Column =
    map(defaultImageCategory.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)

  /** `media.py` trailing-slash strip (NOT the full URL repair — the
    * store only normalizes slashes here; scheme repair happened at
    * extraction).
    */
  private def stripSlashes(c: Column): Column =
    regexp_replace(c, "/+$", "")

  /** One-pass clean. Expects the extraction-normalized record shape:
    * foreign_identifier, foreign_landing_url, url, thumbnail_url,
    * creator_url, license, license_version, license_url,
    * raw_license_url, meta_data (map<string,string>, nullable),
    * category, source.
    */
  def cleanMediaMetadata(df: DataFrame, provider: String,
      stripUrlTrailingSlashes: Boolean = true): DataFrame = {
    val urlCols =
      Seq("foreign_landing_url", "url", "thumbnail_url", "creator_url")
    val slashed = if (stripUrlTrailingSlashes)
      urlCols.foldLeft(df)((d, c) =>
        if (d.columns.contains(c)) d.withColumn(c, stripSlashes(col(c)))
        else d)
    else df
    slashed
      .withColumn("provider", lit(provider))
      .withColumn("source",
        CleanFunctions.defaultSource(col("source"), col("provider")))
      .withColumn("category",
        coalesce(col("category"), element_at(categoryMap, col("source"))))
      // license URLs move INTO meta_data (media.py:141-152), new values
      // overwriting any stale keys (dict-update semantics: strip the
      // keys first so map_concat never sees duplicates)
      .withColumn("meta_data", map_concat(
        map_filter(
          coalesce(col("meta_data"), map().cast("map<string,string>")),
          (k, _) => !k.isin("license_url", "raw_license_url")),
        map_filter(
          map(lit("license_url"), col("license_url"),
            lit("raw_license_url"), col("raw_license_url")),
          (_, v) => v.isNotNull)))
      // ... and the columns disappear from the record
      .drop("license_url", "raw_license_url")
      // P1: required fields or the record drops
      .transform(MergeUpsert.filterRequired(_,
        Seq("foreign_identifier", "foreign_landing_url", "url",
          "license")))
  }
}
