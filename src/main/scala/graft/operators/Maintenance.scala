package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.LicenseMap

/** One-shot maintenance jobs (reference `catalog/dags/maintenance/`).
  * Each reads the live table, fixes a data defect in bulk, and writes
  * back — here expressed as single-pass columnar transforms suitable for
  * `VersionedTable.mergeInto` / `commit`.
  */
object Maintenance {

  /** `add_license_url.py:59-132` — every row whose `meta_data` is NULL
    * gets `meta_data = {"license_url": <url>}` where the URL is rebuilt
    * from the (lowercased license, version) pair via the frozen reverse
    * license map (some CC0/PDM rows are stored uppercase —
    * add_license_url.py:88-90); the license column is lowercased on the
    * updated rows. Pairs absent from the map leave the row untouched
    * (the reference routes them to an invalid-items TSV instead of
    * updating — surface them as `meta_data IS NULL` survivors).
    *
    * The reference runs one UPDATE per license group over an id list
    * collected to the driver; at scale that is one broadcast hash join
    * of the tiny reverse map against only the null-meta rows — no
    * driver-side id lists, one pass, no shuffle of the fact table.
    */
  def addLicenseUrl(table: DataFrame): DataFrame = {
    val rd = LicenseMap.reverseDim(table.sparkSession).select(
      col("license").as("__rl"), col("license_version").as("__rv"),
      col("license_path").as("__rp"))
    val needsFix = col("meta_data").isNull
    table
      .join(broadcast(rd),
        needsFix && lower(col("license")) === col("__rl") &&
          LicenseMap.normalizeVersion(col("license_version")) === col("__rv"),
        "left")
      .withColumn("__url", when(col("__rp").isNotNull,
        concat(lit("https://creativecommons.org/"), col("__rp"), lit("/"))))
      .withColumn("license",
        when(needsFix && col("__url").isNotNull, lower(col("license")))
          .otherwise(col("license")))
      .withColumn("meta_data",
        when(needsFix && col("__url").isNotNull,
          map(lit("license_url"), col("__url")))
          .otherwise(col("meta_data")))
      .drop("__rl", "__rv", "__rp", "__url")
  }
}
