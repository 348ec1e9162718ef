package graft.inat

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.MergeUpsert

/** The iNaturalist bulk pipeline (SURVEY.md §3.2) as one pure DataFrame
  * program — the reference runs it as ~2,400 lines of staged Postgres
  * SQL in 2M-row batches with a 39-minute-per-batch ceiling
  * (`catalog/dags/providers/provider_csv_load_scripts/inaturalist/`
  * SQL files, `inaturalist.py:364-458`); here the whole dataset is one
  * plan:
  * no batching (Spark partitions the 120M-photo scan), the taxonomy
  * ancestor expansion is an explode + hash join instead of a
  * nested-loop `= ANY(string_to_array(...))`, and the dims broadcast.
  */
object Inat {

  /** Source TSV-in-CSV readers (gzipped, header, tab separator, \b
    * quote — photos.sql:33-38 import options).
    */
  def readTable(spark: SparkSession, path: String): DataFrame = {
    val table = schemas.keys.find(path.contains(_)).getOrElse(
      throw new IllegalArgumentException(s"no known iNat table in $path"))
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("quote", "")
      .schema(schemas(table))
      .csv(path)
  }

  /** Explicit source schemas (photos.sql:18-27, observations.sql:14-23,
    * observers.sql:12-16, taxa DDL) — inferSchema would be a second full
    * scan of the 120M-row photos CSV at production scale. uuid/date
    * columns read as string (uuids are opaque join keys here).
    */
  val schemas: Map[String, StructType] = Map(
    "photos" -> StructType(Seq(
      StructField("photo_uuid", StringType),
      StructField("photo_id", IntegerType),
      StructField("observation_uuid", StringType),
      StructField("observer_id", IntegerType),
      StructField("extension", StringType),
      StructField("license", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("position", IntegerType))),
    "observations" -> StructType(Seq(
      StructField("observation_uuid", StringType),
      StructField("observer_id", IntegerType),
      StructField("latitude", DecimalType(15, 10)),
      StructField("longitude", DecimalType(15, 10)),
      StructField("positional_accuracy", IntegerType),
      StructField("taxon_id", IntegerType),
      StructField("quality_grade", StringType),
      StructField("observed_on", DateType))),
    "observers" -> StructType(Seq(
      StructField("observer_id", IntegerType),
      StructField("login", StringType),
      StructField("name", StringType))),
    "taxa" -> StructType(Seq(
      StructField("taxon_id", IntegerType),
      StructField("ancestry", StringType),
      StructField("rank_level", DoubleType),
      StructField("rank", StringType),
      StructField("name", StringType),
      StructField("active", BooleanType))))

  /** License code → (license, version) dim
    * (`inaturalist/create_schema.sql` license_codes seed; iNat exposes
    * the standard CC 4.0 suite plus CC0/PDM).
    */
  def licenseCodes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("CC0", "cc0", "1.0"), ("CC-BY", "by", "4.0"),
      ("CC-BY-NC", "by-nc", "4.0"), ("CC-BY-ND", "by-nd", "4.0"),
      ("CC-BY-SA", "by-sa", "4.0"), ("CC-BY-NC-ND", "by-nc-nd", "4.0"),
      ("CC-BY-NC-SA", "by-nc-sa", "4.0"), ("PD", "pdm", "1.0"),
      ("GFDL", "gfdl", "1.3"))
      .toDF("inat_code", "cc_license", "license_version")
  }

  /** A8 — photo ids appearing more than once (photos.sql:41-48). */
  def photoDupes(photos: DataFrame): DataFrame =
    photos.groupBy("photo_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("photo_id")

  /** J5 — taxa enriched with their ancestors' names as tags: explode
    * the slash-separated ancestry into ids, hash-join back to taxa,
    * collect ancestor names (root-first by path position), cap at 20
    * (taxa.sql:222-256 without the Catalog-of-Life vernacular sources).
    */
  def taxaEnriched(taxa: DataFrame): DataFrame = {
    val anc = taxa
      .select(col("taxon_id"),
        posexplode(split(col("ancestry"), "/")).as(Seq("pos", "anc_id")))
      .withColumn("anc_id", col("anc_id").cast("int"))
      .join(taxa.select(col("taxon_id").as("anc_id"),
        col("name").as("anc_name")), Seq("anc_id"))
      .groupBy("taxon_id")
      .agg(slice(array_sort(collect_list(struct(col("pos"), col("anc_name"))))
        .getField("anc_name"), 1, 20).as("ancestor_tags"))
    taxa.select(col("taxon_id"), col("name").as("title"), col("rank"))
      .join(anc, Seq("taxon_id"), "left")
      .withColumn("ancestor_tags",
        coalesce(col("ancestor_tags"), array().cast("array<string>")))
  }

  /** The transformed-table star join (transformed_table.template.sql:
    * 17-77): photos ⋈ observations ⋈ observers ⋈ enriched taxa ⋈
    * license codes, minus duplicate photo_ids, plus URL/creator
    * synthesis (P25) — emitting catalog-shaped records.
    */
  def transform(photos: DataFrame, observations: DataFrame,
      observers: DataFrame, taxa: DataFrame): DataFrame = {
    val spark = photos.sparkSession
    val dupes = photoDupes(photos)
    val enriched = taxaEnriched(taxa)
    val deduped = photos
      .join(dupes, Seq("photo_id"), "left_anti")   // J2
    deduped
      .join(observations, Seq("observation_uuid"))
      .join(broadcast(observers), Seq("observer_id"))
      .join(enriched, Seq("taxon_id"))
      .join(broadcast(licenseCodes(spark)),
        col("license") === col("inat_code"))
      .select(
        col("photo_id").cast("string").as("foreign_identifier"),
        concat(lit("https://www.inaturalist.org/photos/"), col("photo_id"))
          .as("foreign_landing_url"),
        concat(lit("https://inaturalist-open-data.s3.amazonaws.com/photos/"),
          col("photo_id"), lit("/original."),
          when(lower(col("extension")) === "jpeg", "jpg")
            .otherwise(lower(col("extension")))).as("url"),
        coalesce(col("name"), col("login")).as("creator"),
        col("title"), col("ancestor_tags").as("tags"),
        col("cc_license").as("license"), col("license_version"),
        col("width").cast("int").as("width"),
        col("height").cast("int").as("height"),
        col("quality_grade"),
        lit("inaturalist").as("provider"))
  }
}
