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
}
