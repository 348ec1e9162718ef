package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S12 boundary — the Elasticsearch `_bulk` ndjson format (the public
  * wire format the reference's downstream ingestion server feeds from
  * the catalog's records). The PUSH itself stays an external-system
  * concern; what the engine owns is producing correctly-shaped bulk
  * payload lines at scale: one action line + one document line per
  * record, partitioned into bounded batches.
  */
object EsBulk {

  /** `{"index": {"_index": "...", "_id": "..."}}` action line. */
  def actionLine(index: String, id: Column): Column =
    concat(lit("""{"index": {"_index": """"), lit(index),
      lit("""", "_id": """), TsvRow.jsonStr(id), lit("}}"))

  /** Two-line bulk entry per record: action + JSON document (all
    * non-null columns of the row; struct/array/map columns serialize
    * through to_json's JSON composition).
    */
  def bulkLines(df: DataFrame, index: String, idCol: String): DataFrame = {
    val docJson = to_json(struct(df.columns.toIndexedSeq.map(col): _*))
    df.select(concat(
      actionLine(index, col(idCol)), lit("\n"), docJson).as("value"))
  }

  /** Write the payload as text files with a bounded number of entries
    * per file — each file is one well-formed `_bulk` request body, so
    * the uploader never re-chunks (maxRecordsPerFile is the batch cap).
    */
  def writeBulkFiles(df: DataFrame, index: String, idCol: String,
      path: String, maxPerFile: Int = 5000): Unit =
    bulkLines(df, index, idCol)
      .write
      .option("maxRecordsPerFile", maxPerFile)
      .mode("overwrite")
      .text(path)
}
