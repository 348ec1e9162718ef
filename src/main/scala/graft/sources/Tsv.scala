package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** S4/S5 — the reference's versioned TSV staging format
  * (`catalog/dags/common/storage/tsv_columns.py:66-88` column order,
  * `media.py:221-249` writer semantics: tab-separated, no header,
  * `\N` null marker).
  *
  * Internally the engine is parquet/columnar; TSV exists at the
  * boundary for compatibility with reference fixtures and downstream
  * consumers.
  */
object Tsv {

  /** Image TSV v001 columns, in load-bearing order. */
  val imageV001: StructType = StructType(Seq(
    StructField("foreign_identifier", StringType),
    StructField("foreign_landing_url", StringType),
    StructField("url", StringType),
    StructField("thumbnail_url", StringType),
    StructField("filetype", StringType),
    StructField("filesize", IntegerType),
    StructField("license_", StringType),
    StructField("license_version", StringType),
    StructField("creator", StringType),
    StructField("creator_url", StringType),
    StructField("title", StringType),
    StructField("meta_data", StringType),      // JSON object text
    StructField("tags", StringType),           // JSON array text
    StructField("category", StringType),
    StructField("watermarked", StringType),    // 't' / 'f'
    StructField("provider", StringType),
    StructField("source", StringType),
    StructField("ingestion_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Audio TSV v001 (tsv_columns.py:15-42): shares the first 18 image
    * columns (minus width/height) then audio-specific fields.
    */
  val audioV001: StructType = StructType(
    imageV001.fields.dropRight(2) ++ Seq(
      StructField("duration", IntegerType),
      StructField("bit_rate", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("genres", StringType),       // PG array literal {a,b}
      StructField("audio_set", StringType),    // JSON object text
      StructField("set_position", IntegerType),
      StructField("alt_files", StringType)))   // JSON array text

  /** Legacy image TSV v000 (tsv_columns.py "000" list): no filetype or
    * category, width/height mid-row rather than trailing.
    */
  val imageV000: StructType = StructType(Seq(
    StructField("foreign_identifier", StringType),
    StructField("foreign_landing_url", StringType),
    StructField("url", StringType),
    StructField("thumbnail_url", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("filesize", IntegerType),
    StructField("license_", StringType),
    StructField("license_version", StringType),
    StructField("creator", StringType),
    StructField("creator_url", StringType),
    StructField("title", StringType),
    StructField("meta_data", StringType),
    StructField("tags", StringType),
    StructField("watermarked", StringType),
    StructField("provider", StringType),
    StructField("source", StringType),
    StructField("ingestion_type", StringType)))

  /** `loader/paths.py:31-48` — TSV version from the filename: `_vNNN_`
    * if present, else the legacy "000".
    */
  def tsvVersion(fileName: String): String = {
    val m = "_v(\\d+)_".r.findFirstMatchIn(fileName)
    m.map(_.group(1)).getOrElse("000")
  }

  /** Schema registry keyed like the reference's COLUMNS dict
    * (tsv_columns.py). Audio has no legacy version — its history starts
    * at 001.
    */
  def schemaFor(mediaType: String, version: String): StructType =
    (mediaType, version.toInt) match {
      case ("image", 0) => imageV000
      case ("image", _) => imageV001
      case ("audio", v) if v >= 1 => audioV001
      case _ => throw new IllegalArgumentException(
        s"no TSV schema for $mediaType v$version")
    }

  /** Resolve the right schema from a staged TSV's filename, e.g.
    * `behance_image_20210906130355.tsv` → image v000.
    */
  def schemaForFile(fileName: String): StructType = {
    val media = if (fileName.contains("_audio_")) "audio" else "image"
    schemaFor(media, tsvVersion(fileName))
  }

  def read(spark: SparkSession, path: String, schema: StructType = imageV001)
      : DataFrame =
    spark.read
      .schema(schema)
      .option("sep", "\t")
      .option("nullValue", "\\N")
      .option("header", "false")
      .csv(path)

  /** Read with malformed-row quarantine (S6 — the reference deletes bad
    * lines and retries up to 10×, loader/sql.py:126-141; we keep them in
    * a `_corrupt` column instead of mutating the input).
    */
  def readPermissive(spark: SparkSession, path: String,
      schema: StructType = imageV001): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", StringType))
      .option("sep", "\t")
      .option("nullValue", "\\N")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  def write(df: DataFrame, path: String): Unit =
    df.write
      .option("sep", "\t")
      .option("nullValue", "\\N")
      .option("emptyValue", "")
      .option("header", "false")
      .mode("overwrite")
      .csv(path)
}
