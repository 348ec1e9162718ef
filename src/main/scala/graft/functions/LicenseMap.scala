package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** P2 — license URL → canonical (license, version) normalization
  * (reference `catalog/dags/common/licenses/licenses.py:30-134` + the
  * path map in `licenses/constants.py:3-128`).
  *
  * The reference resolves unknown CC URLs over the network; we freeze
  * the mapping as a broadcast dimension (exactly what its lru_cache
  * converges to) — at 100 TB a per-row HTTP fallback is not an option,
  * and the reference's own tests run with the network blocked too.
  */
object LicenseMap {

  /** `constants.NO_VERSION` — versionless licenses (licenses/publicdomain). */
  val NoVersion = "N/A"

  /** `constants._SIMPLE_LICENSE_PATHS:3-50` — paths that split into
    * (license, version) and are recoverable from the pair.
    */
  private val simplePaths: Seq[String] = {
    val eras = Seq("1.0", "2.0", "2.5", "3.0", "4.0")
    val byFamily = for {
      l <- Seq("by", "by-nc", "by-nc-nd", "by-nc-sa", "by-nd", "by-sa")
      v <- eras
      // by-nc-nd has no 1.0 (it was by-nd-nc then — see special cases)
      if !(l == "by-nc-nd" && v == "1.0")
    } yield s"licenses/$l/$v"
    byFamily ++ Seq(
      "licenses/devnations/2.0",
      "licenses/nc/1.0", "licenses/nc/2.0/jp",
      "licenses/nc-sa/1.0", "licenses/nc-sa/2.0/jp",
      "licenses/nc-sampling+/1.0",
      "licenses/nd/1.0", "licenses/nd/2.0/jp",
      "licenses/nd-nc/1.0", "licenses/nd-nc/2.0/jp",
      "licenses/sa/1.0", "licenses/sa/2.0/jp",
      "licenses/sampling+/1.0", "licenses/sampling/1.0")
  }

  /** `constants._SIMPLE_IRREVERSIBLE_LICENSE_PATHS:52-75` — the 2.1
    * jurisdiction ports: split correctly but need the jurisdiction to
    * rebuild, so they are forward-only.
    */
  private val irreversiblePaths: Seq[String] = for {
    l <- Seq("by", "by-nc", "by-nc-nd", "by-nc-sa", "by-nd", "by-sa")
    j <- Seq("au", "es", "jp")
  } yield s"licenses/$l/2.1/$j"

  /** `constants._SPECIAL_CASE_LICENSE_PATHS:77-86` — manual pairs,
    * recoverable from the pair.
    */
  private val specialCasePaths: Seq[(String, (String, String))] = Seq(
    "licenses/by-nd-nc/1.0" -> ("by-nc-nd", "1.0"),
    "licenses/by-nd-nc/2.0/jp" -> ("by-nc-nd", "2.0"),
    "licenses/publicdomain" -> ("publicdomain", NoVersion),
    "publicdomain/mark/1.0" -> ("pdm", "1.0"),
    "publicdomain/zero/1.0" -> ("cc0", "1.0"))

  /** `constants._SPECIAL_CASE_IRREVERSIBLE_LICENSE_PATHS:88-93`. */
  private val specialIrreversiblePaths: Seq[(String, (String, String))] =
    Seq("licenses/mark/1.0" -> ("pdm", "1.0"))

  private def splitPair(path: String): (String, String) = {
    val parts = path.split("/")
    (parts(1), parts(2))
  }

  /** Full forward map: canonical CC path → (license, version) — the
    * Scala image of `constants.get_license_path_map():109-116`.
    * 68 entries.
    */
  val pathMap: Seq[(String, String, String)] =
    ((simplePaths ++ irreversiblePaths).map(p => p -> splitPair(p)) ++
      specialCasePaths ++ specialIrreversiblePaths)
      .map { case (p, (l, v)) => (p, l, v) }

  /** Reverse map: (license, version) → canonical path — the image of
    * `constants.get_reverse_license_path_map():119-128`, including the
    * 2.1-unported → 2.0 downgrades (`_SPECIAL_REVERSE_ONLY_PATHS:96-102`).
    */
  val reverseMap: Seq[(String, String, String)] = {
    val fromSimple = simplePaths.map { p =>
      val (l, v) = splitPair(p); (l, v, p)
    }
    val fromSpecial = specialCasePaths.map { case (p, (l, v)) => (l, v, p) }
    val reverseOnly = Seq("by", "by-nc", "by-nc-nd", "by-nc-sa", "by-nd", "by-sa")
      .map(l => (l, "2.1", s"licenses/$l/2.0"))
    // last-write-wins like dict.update: jp-jurisdiction simple paths such
    // as licenses/nc/2.0/jp keep only their final entry per pair
    (fromSimple ++ fromSpecial ++ reverseOnly)
      .foldLeft(Vector.empty[(String, String, String)]) { case (acc, e) =>
        acc.filterNot(x => x._1 == e._1 && x._2 == e._2) :+ e
      }
  }

  def dim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    pathMap.toDF("license_path", "license", "license_version")
  }

  def reverseDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    reverseMap.toDF("license", "license_version", "license_path")
  }

  /** Extract the normalized creativecommons path from a raw license URL:
    * scheme/host stripped, trailing slash dropped, lowercased
    * (`licenses._get_valid_cc_url:137-188` minus the network rewrite).
    * The char class includes `+` for sampling+/nc-sampling+.
    */
  def licensePath(url: Column): Column =
    regexp_replace(
      regexp_extract(lower(url),
        // host is anchored (start-of-string or //) because the reference
        // requires netloc == creativecommons.org exactly — substrings
        // like notcreativecommons.org must not match
        "(?:^|//)creativecommons\\.org/([a-z/.0-9+-]+?)(?:/(?:legalcode|deed)[.a-z]*)?/?$",
        1),
      "/$", "")

  /** Annotate rows with canonical license info via broadcast lookup;
    * rows whose URL resolves to no known license get nulls (the
    * reference drops those records — compose with a filter).
    */
  def resolve(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("license_path", licensePath(col(urlCol)))
      .join(broadcast(dim(df.sparkSession)), Seq("license_path"), "left")

  /** `licenses._ensure_license_version_string:212-226` — cast numeric
    * versions through double so "2" → "2.0"; pass N/A through; anything
    * non-numeric → null.
    */
  def normalizeVersion(version: Column): Column =
    when(version === NoVersion, version)
      .otherwise(version.cast("double").cast("string"))

  /** Pair fallback (`licenses.get_license_info_from_license_pair:191-209`):
    * validate a (license, version) pair against the reverse map and derive
    * the canonical URL; unknown pairs get nulls.
    */
  def resolvePair(df: DataFrame, licenseCol: String, versionCol: String): DataFrame = {
    val rd = reverseDim(df.sparkSession)
      .withColumnRenamed("license", "rv_license")
      .withColumnRenamed("license_version", "rv_version")
    df.withColumn("license_version_n", normalizeVersion(col(versionCol)))
      .join(broadcast(rd),
        col(licenseCol) === col("rv_license") &&
          col("license_version_n") === col("rv_version"), "left")
      .drop("rv_license", "rv_version")
      .withColumn("license_url",
        when(col("license_path").isNotNull,
          concat(lit("https://creativecommons.org/"), col("license_path"), lit("/"))))
  }
}
