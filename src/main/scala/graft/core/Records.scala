package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed record model for the catalog (SURVEY.md §1.2): the fixed-shape
  * nested columns get real types (tags, audio_set, alt_files);
  * heterogeneous `meta_data` deliberately stays JSON text +
  * get_json_object, matching the reference's jsonb usage.
  */
object Records {

  /** The enriched tag shape (media.py:305-311 / openverse_tag). */
  case class Tag(name: String, provider: String)

  /** Audio alt file (storage/audio.py:130-133). */
  case class AltFile(url: String, filesize: Option[Int],
      bit_rate: Option[Int], sample_rate: Option[Int])

  /** Audio set (storage/audio.py:146-153). */
  case class AudioSet(title: String, foreign_landing_url: String,
      thumbnail: Option[String], creator: Option[String],
      creator_url: Option[String], foreign_identifier: String)

  val tagType: DataType =
    ArrayType(StructType(Seq(StructField("name", StringType),
      StructField("provider", StringType))))

  val altFilesType: DataType = ArrayType(StructType(Seq(
    StructField("url", StringType), StructField("filesize", IntegerType),
    StructField("bit_rate", IntegerType),
    StructField("sample_rate", IntegerType))))

  val audioSetType: DataType = StructType(Seq(
    StructField("title", StringType),
    StructField("foreign_landing_url", StringType),
    StructField("thumbnail", StringType),
    StructField("creator", StringType),
    StructField("creator_url", StringType),
    StructField("foreign_identifier", StringType)))

  /** P9 write side — array column → PG array literal, the exact format
    * of the reference's ArrayColumn.prepare_string (columns.py:534-556):
    * json.dumps-encoded elements inside braces with comma-space
    * separators, `{"a", "b c", null}` (byte-level parity proven in
    * TsvRowSpec against the reference's own expected rows).
    */
  def toPgArray(arr: Column): Column =
    when(arr.isNull, lit(null).cast("string"))
      .otherwise(concat(lit("{"),
        array_join(transform(arr, graft.sources.TsvRow.jsonStr(_)),
          ", ", "null"),
        lit("}")))

  /** P9 read side — PG array literal → array<string>. Literals written
    * by [[toPgArray]]/the reference have JSON-quoted elements, so the
    * braces swap for brackets and parse as JSON (which keeps embedded
    * commas and quotes intact); legacy unquoted literals `{a,b}` fail
    * that parse and fall back to a plain comma split.
    */
  def fromPgArray(c: Column): Column = {
    val inner = regexp_replace(c, "^\\{|\\}$", "")
    val asJson = from_json(concat(lit("["), inner, lit("]")),
      ArrayType(StringType))
    when(c.isNull, lit(null).cast("array<string>"))
      .otherwise(coalesce(asJson, split(inner, ",")))
  }

  /** Parse the TSV boundary's JSON text columns into typed columns
    * (the inverse happens with to_json on write). Unknown/extra keys
    * are dropped by from_json; malformed JSON → null (quarantinable).
    */
  def typedAudioColumns(tsv: DataFrame): DataFrame =
    tsv
      .withColumn("tags_typed", from_json(col("tags"), tagType))
      .withColumn("audio_set_typed",
        from_json(col("audio_set"), audioSetType))
      .withColumn("alt_files_typed",
        from_json(col("alt_files"), altFilesType))
      // genres arrives as a PG array literal (P9)
      .withColumn("genres_typed", fromPgArray(col("genres")))
}
