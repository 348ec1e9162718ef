package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.ingest.ProviderExtract

/** Golden tests for the offset-pagination (jamendo) and multi-record
  * (smithsonian) provider archetypes, run over the reference's OWN test
  * resource JSON — expected values are the reference's
  * test_jamendo.py:67-101 / test_smithsonian.py expectations.
  */
class ProviderGoldenSpec extends SparkSpec {
  import spark.implicits._

  private val res =
    "/root/reference/catalog/tests/dags/providers/provider_api_scripts/resources"

  private def fixture(rel: String): String =
    new String(Files.readAllBytes(Paths.get(s"$res/$rel")), "UTF-8")

  test("jamendoish: reference audio_data_example -> expected record") {
    val batch =
      s"""{"headers":{"results_count":1},"results":[${fixture("jamendo/audio_data_example.json")}]}"""
    val got = ProviderExtract.jamendoish(spark, Seq(batch).toDS()).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("foreign_identifier") == "732")
    assert(r.getAs[String]("foreign_landing_url") ==
      "https://www.jamendo.com/track/732")
    // `from` secret param stripped from the audio URL
    assert(r.getAs[String]("url") ==
      "https://mp3d.jamendo.com/?trackid=732&format=mp32")
    assert(r.getAs[Long]("duration") == 144000L)
    assert(r.getAs[String]("filetype") == "mp32")
    assert(r.getAs[String]("category") == "music")
    // photon slash added, trackid kept on the track thumbnail
    assert(r.getAs[String]("thumbnail_url") ==
      "https://usercontent.jamendo.com/?type=album&id=119&width=200&trackid=732")
    assert(r.getAs[String]("title") == "Thoughtful")
    assert(r.getAs[String]("creator") == "Haeresis")
    assert(r.getAs[String]("creator_url") ==
      "https://www.jamendo.com/artist/92/haeresis")
    assert(r.getAs[String]("license") == "by-nc" &&
      r.getAs[String]("license_version") == "2.0")
    val meta = r.getAs[Map[String, String]]("meta_data")
    assert(meta == Map("release_date" -> "2005-04-12", "downloads" -> "0",
      "listens" -> "5616", "playlists" -> "0")) // lyrics empty -> dropped
    assert(r.getAs[collection.Seq[String]]("tags").toSeq ==
      Seq("instrumental", "speed_medium"))
    assert(r.getAs[collection.Seq[String]]("genres").toSeq == Seq.empty)
    val set = r.getAs[org.apache.spark.sql.Row]("audio_set")
    assert(set.getAs[String]("set_foreign_id") == "119")
    assert(set.getAs[String]("audio_set") == "Opera I")
    assert(set.getAs[Long]("set_position") == 6L)
    assert(set.getAs[String]("set_url") ==
      "https://www.jamendo.com/album/119/opera-i")
    // set thumbnail: slash added AND trackid dropped (set identity)
    assert(set.getAs[String]("set_thumbnail") ==
      "https://usercontent.jamendo.com/?type=album&id=119&width=200")
  }

  test("jamendoish: missing required fields drop the record") {
    val base = fixture("jamendo/audio_data_example.json")
    for (killed <- Seq("shareurl", "audio", "license_ccurl")) {
      val mutated = base.replaceFirst(s""""$killed":\\s*"[^"]*"""",
        s""""$killed": null""")
      assert(mutated != base, s"fixture key $killed not found")
      val batch = s"""{"headers":{"results_count":1},"results":[$mutated]}"""
      assert(ProviderExtract.jamendoish(spark, Seq(batch).toDS())
        .count() == 0, s"record with null $killed must drop")
    }
  }

  test("smithsonianish: actual_record_data fans out one CC0 image") {
    val batch =
      s"""{"response":{"rowCount":1,"rows":[${fixture("smithsonian/actual_record_data.json")}]}}"""
    val got = ProviderExtract.smithsonianish(spark, Seq(batch).toDS())
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("foreign_identifier") ==
      "https://collections.nmnh.si.edu/media/?irn=15814382")
    assert(r.getAs[String]("url") ==
      "https://collections.nmnh.si.edu/media/?irn=15814382")
    assert(r.getAs[String]("foreign_landing_url") ==
      "http://n2t.net/ark:/65665/34857ca78-9195-4156-849b-1ec47f7cd1ce")
    assert(r.getAs[String]("title") ==
      "Passerculus sandwichensis nevadensis")
    // J11 sub-provider lookup: NMNHBIRDS -> natural history museum
    assert(r.getAs[String]("source") ==
      "smithsonian_national_museum_of_natural_history")
    // ranked creator pick: 'Collector' (rank 6) is the only candidate
    assert(r.getAs[String]("creator") == "Seymour H. Levy")
    val meta = r.getAs[Map[String, String]]("meta_data")
    assert(meta("unit_code") == "NMNHBIRDS")
    assert(meta("data_source") == "NMNH - Vertebrate Zoology - Birds Division")
    assert(!meta.contains("description") && !meta.contains("label_text"))
    // tag_types order: date, object_type, topic, place
    assert(r.getAs[collection.Seq[String]]("tags").toSeq == Seq("1950s",
      "Animals", "Birds", "United States", "Pinal", "North America",
      "Arizona"))
    assert(r.getAs[String]("license") == "cc0" &&
      r.getAs[String]("license_version") == "1.0")
  }

  test("smithsonianish: row without landing url yields no records") {
    // sub_provider_example has no record_link/guid -> required-field drop
    val batch = fixture("smithsonian/sub_provider_example.json")
    assert(ProviderExtract.smithsonianish(spark, Seq(batch).toDS())
      .count() == 0)
  }

  test("smithsonianish: multi-image rows fan out per CC0 media item") {
    val row =
      """{"content":{"descriptiveNonRepeating":{
        |"record_link":"https://si.edu/object/x","unit_code":"SIA",
        |"data_source":"Archives","title":{"content":"Two views"},
        |"online_media":{"media":[
        | {"content":"https://ids.si.edu/1","idsId":"id-1","type":"Images",
        |  "usage":{"access":"CC0"}},
        | {"content":"https://ids.si.edu/2","idsId":"id-2","type":"Images",
        |  "usage":{"access":"CC0"}},
        | {"content":"https://ids.si.edu/3","idsId":"id-3","type":"Images",
        |  "usage":{"access":"Usage conditions apply"}},
        | {"content":"https://ids.si.edu/4","idsId":null,"type":"Images",
        |  "usage":{"access":"CC0"}},
        | {"content":"https://ids.si.edu/5","idsId":"id-5","type":"Videos",
        |  "usage":{"access":"CC0"}}]}},
        |"freetext":{},"indexedStructured":{}}}"""
        .stripMargin.replaceAll("\n", "")
    val batch = s"""{"response":{"rowCount":1,"rows":[$row]}}"""
    val got = ProviderExtract.smithsonianish(spark, Seq(batch).toDS())
      .orderBy("foreign_identifier").collect()
    // non-CC0, null-id and non-Image items all filtered
    assert(got.map(_.getAs[String]("foreign_identifier")).toSeq ==
      Seq("id-1", "id-2"))
    assert(got.forall(_.getAs[String]("title") == "Two views"))
  }
}
