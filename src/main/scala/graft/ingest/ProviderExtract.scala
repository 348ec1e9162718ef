package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
}
