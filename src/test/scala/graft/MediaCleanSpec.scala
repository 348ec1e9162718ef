package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.MediaClean

/** Mirrors the reference's tests/dags/common/storage/test_media.py
  * clean_media_metadata cases against the one-pass columnar form.
  */
class MediaCleanSpec extends SparkSpec {
  import spark.implicits._

  private def record(
      fid: String = "fid-1",
      landing: String = "https://landing.example.com",
      url: String = "https://images.example.com/1.jpg",
      thumb: String = null,
      creatorUrl: String = null,
      license: String = "by",
      version: String = "4.0",
      licenseUrl: String = "https://creativecommons.org/licenses/by/4.0/",
      rawLicenseUrl: String = "raw_license",
      meta: Map[String, String] = null,
      category: String = null,
      source: String = null): DataFrame =
    Seq((fid, landing, url, thumb, creatorUrl, license, version,
      licenseUrl, rawLicenseUrl, meta, category, source))
      .toDF("foreign_identifier", "foreign_landing_url", "url",
        "thumbnail_url", "creator_url", "license", "license_version",
        "license_url", "raw_license_url", "meta_data", "category",
        "source")

  test("required fields unchanged; provider stamped; source defaults") {
    val got = MediaClean.cleanMediaMetadata(record(), "test_provider")
      .collect().head
    assert(got.getAs[String]("url") == "https://images.example.com/1.jpg")
    assert(got.getAs[String]("foreign_landing_url") ==
      "https://landing.example.com")
    assert(got.getAs[String]("provider") == "test_provider")
    assert(got.getAs[String]("source") == "test_provider")
  }

  test("license url columns disappear, values land in meta_data") {
    val out = MediaClean.cleanMediaMetadata(record(), "p")
    assert(!out.columns.contains("license_url") &&
      !out.columns.contains("raw_license_url"))
    val meta = out.collect().head.getAs[Map[String, String]]("meta_data")
    assert(meta("license_url") ==
      "https://creativecommons.org/licenses/by/4.0/")
    assert(meta("raw_license_url") == "raw_license")
  }

  test("stale meta license keys are overwritten, others survive") {
    val meta = Map("license_url" -> "stale", "k" -> "v")
    val got = MediaClean.cleanMediaMetadata(record(meta = meta), "p")
      .collect().head.getAs[Map[String, String]]("meta_data")
    assert(got("license_url") ==
      "https://creativecommons.org/licenses/by/4.0/")
    assert(got("k") == "v")
  }

  test("default category per source; explicit category kept") {
    val defaulted = MediaClean.cleanMediaMetadata(
      record(source = "clevelandmuseum"), "clevelandmuseum")
      .collect().head
    assert(defaulted.getAs[String]("category") == "digitized_artwork")
    val kept = MediaClean.cleanMediaMetadata(
      record(source = "clevelandmuseum", category = "photograph"),
      "clevelandmuseum").collect().head
    assert(kept.getAs[String]("category") == "photograph")
    // unknown source -> stays null
    val none = MediaClean.cleanMediaMetadata(record(source = "nobody"),
      "nobody").collect().head
    assert(none.getAs[String]("category") == null)
  }

  test("missing required field drops the record (batch form of raise)") {
    for (kill <- Seq("foreign_identifier", "foreign_landing_url", "url")) {
      val df = kill match {
        case "foreign_identifier" => record(fid = null)
        case "foreign_landing_url" => record(landing = null)
        case _ => record(url = null)
      }
      assert(MediaClean.cleanMediaMetadata(df, "p").count() == 0, kill)
    }
  }

  test("tag enrichment: provider stamp, blacklist, passthrough") {
    import graft.functions.CleanFunctions
    // raw string tags: blacklist filters, survivors get the provider
    val raw = Seq((1L, Seq("sunset", "no person", "baby", "Nature",
      "x:y", "cc0 art", "pdm tagged"))).toDF("id", "raw_tags")
    val enriched = raw.select(CleanFunctions.enrichRawTags(
        col("raw_tags"), lit("flickr")).as("tags"))
      .collect().head.getAs[collection.Seq[org.apache.spark.sql.Row]]("tags")
    // "no person" exact; "baby" contains "by"; "x:y" contains ":";
    // "cc0 art" contains "cc0"; "pdm tagged" contains "pdm" -> dropped
    assert(enriched.map(_.getAs[String]("name")).toSeq ==
      Seq("sunset", "Nature"))
    assert(enriched.forall(_.getAs[String]("provider") == "flickr"))
    // parity with the reference's full TAG_CONTAINS_BLACKLIST
    // (media.py:21-33) — all 12 entries, both directions
    assert(CleanFunctions.tagContainsBlacklist.toSet == Set(
      "flickriosapp", "uploaded", ":", "=", "cc0", "by", "by-nc",
      "by-nd", "by-sa", "by-nc-nd", "by-nc-sa", "pdm"))
    // null (non-list) input stays null
    val nulled = Seq((1L, null.asInstanceOf[Seq[String]]))
      .toDF("id", "raw_tags")
      .select(CleanFunctions.enrichRawTags(col("raw_tags"),
        lit("p")).as("tags")).collect().head
    assert(nulled.isNullAt(0))
    // typed pre-enriched tags keep their provider; empty fills in
    val typed = Seq((1L, Seq(("dog", "preenriched"), ("cat", null))))
      .toDF("id", "tags")
      .select(CleanFunctions.enrichTypedTags(
        col("tags").cast("array<struct<name:string,provider:string>>"),
        lit("mine")).as("tags"))
      .collect().head.getAs[collection.Seq[org.apache.spark.sql.Row]]("tags")
    assert(typed.map(r => (r.getAs[String]("name"),
      r.getAs[String]("provider"))).toSeq ==
      Seq(("dog", "preenriched"), ("cat", "mine")))
  }

  test("url trailing slashes strip only when the flag says so") {
    val u = "https://www.example.com/"
    val stripped = MediaClean.cleanMediaMetadata(
      record(landing = u, url = u, thumb = u, creatorUrl = u), "p")
      .collect().head
    for (c <- Seq("foreign_landing_url", "url", "thumbnail_url",
        "creator_url"))
      assert(stripped.getAs[String](c) == "https://www.example.com", c)
    val kept = MediaClean.cleanMediaMetadata(
      record(landing = u, url = u, thumb = u, creatorUrl = u), "p",
      stripUrlTrailingSlashes = false).collect().head
    for (c <- Seq("foreign_landing_url", "url", "thumbnail_url",
        "creator_url"))
      assert(kept.getAs[String](c) == u, c)
  }
}
