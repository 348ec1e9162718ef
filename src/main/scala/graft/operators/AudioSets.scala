package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Records
import graft.functions.CleanFunctions

/** The audio-set side of the catalog (reference `popularity/sql.py:
  * 329-359` audioset_view + `storage/audio.py:185-198` audio
  * validation): each audio row may carry an embedded `audio_set`
  * subrecord; the set view projects ONE row per (set foreign_identifier,
  * provider), choosing the most recently updated audio row's copy of the
  * set fields.
  */
object AudioSets {

  /** `storage/audio.py:194-197` — duration must fit a Postgres int. */
  def guardDuration(df: DataFrame): DataFrame =
    df.withColumn("duration",
      CleanFunctions.overflowGuard(col("duration")))

  /** Parse the TSV boundary's JSON/PG-literal audio columns into typed
    * columns and apply the duration guard — the Spark image of
    * AudioStore._get_audio's validation steps.
    */
  def typedAudio(tsv: DataFrame): DataFrame =
    guardDuration(Records.typedAudioColumns(tsv))

  /** The audioset_view shape (popularity/sql.py:338-358): rows with a
    * set, deduped to newest-per-(set fid, provider). `DISTINCT ON` +
    * `ORDER BY updated_on DESC` made deterministic with `tiebreak`
    * (the reference's underlying order is ctid-arbitrary on ties) —
    * same W2 pattern as newest-per-key, one shuffle on the set key.
    */
  def audioSetView(audio: DataFrame, setCol: String = "audio_set_typed",
      tiebreak: String = "foreign_identifier",
      extraCols: Seq[String] = Nil): DataFrame = {
    val s = col(setCol)
    val w = Window
      .partitionBy(s.getField("foreign_identifier"), col("provider"))
      .orderBy(col("updated_on").desc, col(tiebreak).asc)
    audio
      .filter(s.isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(Seq(
        s.getField("foreign_identifier").as("foreign_identifier"),
        s.getField("title").as("title"),
        s.getField("foreign_landing_url").as("foreign_landing_url"),
        s.getField("creator").as("creator"),
        s.getField("creator_url").as("creator_url"),
        s.getField("thumbnail").as("thumbnail"),
        col("provider")) ++ extraCols.map(col): _*)
  }
}
