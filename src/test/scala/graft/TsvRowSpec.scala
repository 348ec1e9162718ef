package graft

import org.apache.spark.sql.functions._
import graft.sources.TsvRow

/** Byte-exact golden tests: our serialized audio TSV rows must equal
  * the reference's own expected rows from
  * tests/dags/common/storage/test_audio.py
  * (test_create_tsv_row_creates_alt_files:220-271 and
  * test_create_tsv_row_creates_audio_set:274-326), character for
  * character.
  */
class TsvRowSpec extends SparkSpec {
  import spark.implicits._

  private def baseCols = Seq(
    lit("foreign_id"),
    lit("https://landing_page.org"),
    lit("https://audiourl.org"),
    lit("https://thumbnail.com"),
    lit(null).cast("string"),                       // filetype
    lit(null).cast("string"),                       // filesize
    lit("by"), lit("4.0"),
    lit("tyler"), lit("https://creatorurl.com"),
    lit("agreatsong"),
    TsvRow.jsonFromMap(map(lit("description"), lit("cat song"))),
    TsvRow.jsonObject(Seq(
      "name" -> TsvRow.jsonStr(lit("tag1")),
      "provider" -> TsvRow.jsonStr(lit("testing")))),
    lit("music"),
    lit(null).cast("string"),                       // watermarked
    lit("testing_provider"), lit("testing_source"),
    lit("provider_api"),
    TsvRow.intStr(lit(100)),                        // duration
    lit(null).cast("string"),                       // bit_rate
    lit(null).cast("string"),                       // sample_rate
    TsvRow.pgTextArray(array(lit("rock"), lit("pop"))))

  test("alt_files row matches the reference's expected bytes") {
    val altFiles = array(struct(
      lit("https://alternative.com/audio.mp3").as("url"),
      lit(123).as("filesize"),
      lit(41000).as("bit_rate"),
      lit("16000").as("sample_rate")))
    val cols = baseCols ++ Seq(
      lit(null).cast("string"),                     // audio_set
      TsvRow.intStr(lit(1)),                        // set_position
      TsvRow.altFilesJson(altFiles))
    val got = Seq(1).toDF("x").select(TsvRow.line(cols).as("row"))
      .as[String].head()
    val expected = Seq(
      "foreign_id", "https://landing_page.org", "https://audiourl.org",
      "https://thumbnail.com", "\\N", "\\N", "by", "4.0", "tyler",
      "https://creatorurl.com", "agreatsong",
      """{"description": "cat song"}""",
      """{"name": "tag1", "provider": "testing"}""",
      "music", "\\N", "testing_provider", "testing_source",
      "provider_api", "100", "\\N", "\\N",
      """{"rock", "pop"}""", "\\N", "1",
      """[{"url": "https://alternative.com/audio.mp3", "filesize": "123", "bit_rate": "41000", "sample_rate": "16000"}]""")
      .mkString("\t")
    assert(got == expected)
  }

  test("audio_set row matches the reference's expected bytes") {
    val cols = baseCols ++ Seq(
      TsvRow.audioSetJson(lit("test_audio_set"), lit("test.com"),
        lit(1), lit("thumbnail.jpg")),
      TsvRow.intStr(lit(1)),
      lit(null).cast("string"))                     // alt_files
    val got = Seq(1).toDF("x").select(TsvRow.line(cols).as("row"))
      .as[String].head()
    val expected = Seq(
      "foreign_id", "https://landing_page.org", "https://audiourl.org",
      "https://thumbnail.com", "\\N", "\\N", "by", "4.0", "tyler",
      "https://creatorurl.com", "agreatsong",
      """{"description": "cat song"}""",
      """{"name": "tag1", "provider": "testing"}""",
      "music", "\\N", "testing_provider", "testing_source",
      "provider_api", "100", "\\N", "\\N",
      """{"rock", "pop"}""",
      """{"audio_set": "test_audio_set", "set_url": "test.com", "set_position": "1", "set_thumbnail": "thumbnail.jpg"}""",
      "1", "\\N")
      .mkString("\t")
    assert(got == expected)
  }

  test("image row matches the reference's expected bytes") {
    // test_image.py test_create_tsv_row_properly_places_entries:216-279
    val tags = array(struct(lit("tag1").as("name"),
      lit("testing").as("provider")))
    val cols = Seq(
      lit("foreign_id"),
      lit("https://landing_page.com"),
      lit("http://imageurl.com"),
      lit("http://thumbnail.com"),
      lit("png"),
      lit(null).cast("string"),                     // filesize
      lit("testlicense"), lit("1.0"),
      lit("tyler"), lit("https://creatorurl.com"),
      lit("agreatpicture"),
      TsvRow.jsonFromMap(map(lit("description"), lit("cat picture"))),
      TsvRow.tagsJson(tags),
      lit("digitized_artwork"),
      TsvRow.boolStr(lit(false)),
      lit("testing_provider"), lit("testing_source"),
      lit("provider_api"),
      TsvRow.intStr(lit(200)), TsvRow.intStr(lit(500)))
    val got = Seq(1).toDF("x").select(TsvRow.line(cols).as("row"))
      .as[String].head()
    val expected = Seq(
      "foreign_id", "https://landing_page.com", "http://imageurl.com",
      "http://thumbnail.com", "png", "\\N", "testlicense", "1.0",
      "tyler", "https://creatorurl.com", "agreatpicture",
      """{"description": "cat picture"}""",
      """[{"name": "tag1", "provider": "testing"}]""",
      "digitized_artwork", "f", "testing_provider", "testing_source",
      "provider_api", "200", "500")
      .mkString("\t")
    assert(got == expected)
  }

  test("tsv sanitize doubles backslashes and collapses whitespace") {
    val got = Seq("""a \ "b"   c""").toDF("s")
      .select(TsvRow.sanitizeTsv(col("s"))).as[String].head()
    assert(got == """a \\ 'b' c""")
  }

  test("empty collections: json object nulls, pg array braces") {
    val r = Seq(1).toDF("x").select(
      TsvRow.jsonFromMap(map().cast("map<string,string>")).as("m"),
      TsvRow.pgTextArray(array().cast("array<string>")).as("a"),
      TsvRow.altFilesJson(lit(null)
        .cast("array<struct<url:string,filesize:int,bit_rate:int,sample_rate:string>>"))
        .as("f")).collect().head
    assert(r.isNullAt(0))        // empty dict -> falsy -> \N
    assert(r.getString(1) == "{}") // empty list -> {} (columns.py:556)
    assert(r.isNullAt(2))
  }

  test("jsonStr escapes exactly like json.dumps(ensure_ascii=False)") {
    // python3: json.dumps('a\x01b\x1fc\n"d\\e\u000b', ensure_ascii=False)
    //   == '"a\\u0001b\\u001fc\\n\\"d\\\\e\\u000b"'
    val input = "a\u0001b\u001fc\n\"d\\e\u000b"
    val got = Seq(input).toDF("s")
      .select(TsvRow.jsonStr(col("s"))).as[String].head()
    assert(got == "\"a\\u0001b\\u001fc\\n\\\"d\\\\e\\u000b\"")
    // non-ASCII passes through raw (ensure_ascii=False), 0x7f untouched
    val uni = Seq("caf\u00e9 \u007f").toDF("s")
      .select(TsvRow.jsonStr(col("s"))).as[String].head()
    assert(uni == "\"caf\u00e9 \u007f\"")
    // all short-form control escapes
    assert(graft.functions.JsonEscapeExpr.escape("\b\t\n\f\r") ==
      "\\b\\t\\n\\f\\r")
  }
}
