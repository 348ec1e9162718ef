package graft.cc

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The archived Common Crawl link-extraction job
  * (`archive/ExtractCCLinks.py:1-284`) subsumed natively: WAT metadata
  * records (JSON lines) → per-page CC-license link rows → parquet.
  *
  * The reference streams WARC/WAT files per partition from S3 and
  * yields rows from a Python generator; here the landing zone is a
  * directory of WAT-JSON lines read as a Dataset[String] (the fetch
  * layer stays driver-side, like every other source), and the record
  * transform is pure Column work: JSON parse → explode links →
  * creativecommons filter → URL component projection (P28) →
  * per-page aggregation (A12).
  *
  * Output schema mirrors ExtractCCLinks.py:212-223.
  */
object CommonCrawl {

  /** Minimal WAT envelope: the target page + its outbound links. */
  val watSchema: StructType = StructType(Seq(
    StructField("url", StringType),             // WARC-Target-URI
    StructField("content_digest", StringType),
    StructField("warc_id", StringType),
    StructField("links", ArrayType(StructType(Seq(
      StructField("path", StringType),          // e.g. A@/href
      StructField("url", StringType)))))))

  /** Parse raw WAT-JSON lines and emit one row per CC-license link:
    * (provider_domain, cc_link, licence_path, page_url, content_digest,
    * warc_id) — plus per-page link stats.
    */
  def extractLinks(spark: SparkSession, watLines: Dataset[String])
      : DataFrame = {
    val parsed = watLines
      .select(from_json(col("value"), watSchema).as("w"))
      .filter(col("w.url").isNotNull)
    val links = parsed.select(
      col("w.url").as("page_url"),
      col("w.content_digest").as("content_digest"),
      col("w.warc_id").as("warc_id"),
      explode(col("w.links")).as("link"))
    links
      .select(col("page_url"), col("content_digest"), col("warc_id"),
        col("link.url").as("cc_link"))
      .filter(col("cc_link").contains("creativecommons.org"))
      .select(
        parse_url(col("page_url"), lit("HOST")).as("provider_domain"),
        col("cc_link"),
        parse_url(col("cc_link"), lit("PATH")).as("licence_path"),
        col("page_url"), col("content_digest"), col("warc_id"))
  }

  /** Per-(domain, licence) rollup: pages and distinct links — the
    * Counter/dedup the reference builds per record
    * (ExtractCCLinks.py:181-184).
    */
  def linkStats(links: DataFrame): DataFrame =
    links.groupBy("provider_domain", "licence_path")
      .agg(countDistinct(col("page_url")).as("n_pages"),
        countDistinct(col("cc_link")).as("n_links"))

  /** S11 — overwrite-mode parquet sink (ExtractCCLinks.py:225-227). */
  def write(links: DataFrame, out: String): Unit =
    links.write.mode("overwrite").parquet(out)
}
