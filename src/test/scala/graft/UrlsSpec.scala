package graft

import org.apache.spark.sql.functions._
import graft.functions.Urls

/** P3 — mirrors the reference's tests/dags/common/test_urls.py cases
  * (scheme add/upgrade/leave, protocol-relative, IP, trailing slash,
  * invalid structure) against the frozen TLS/PSL maps.
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def validate(s: String, stripSlash: Boolean = true): Option[String] =
    Seq(s).toDF("u")
      .select(Urls.validateUrlString(col("u"), stripSlash).as("v"))
      .as[Option[String]].head()

  private def addScheme(s: String, scheme: String): String =
    Seq(s).toDF("u")
      .select(Urls.addUrlScheme(col("u"), scheme).as("v"))
      .as[String].head()

  test("add_url_scheme adds, upgrades, leaves, handles h-prefix") {
    assert(addScheme("creativecommons.org", "https") ==
      "https://creativecommons.org")
    assert(addScheme("http://creativecommons.org", "https") ==
      "https://creativecommons.org")
    assert(addScheme("http://creativecommons.org", "http") ==
      "http://creativecommons.org")
    assert(addScheme("hreativecommons.org/h", "https") ==
      "https://hreativecommons.org/h")
    assert(addScheme("hreativecommons.org/?referer=https://abc.com", "https") ==
      "https://hreativecommons.org/?referer=https://abc.com")
  }

  test("validate_url_string repairs and rejects like the reference") {
    // no scheme, domain not in TLS map -> http
    assert(validate("creativecomons.org") == Some("http://creativecomons.org"))
    // broken scheme, no TLD -> None
    assert(validate("https:/abcd") == None)
    // TLS-supporting domain upgrades http -> https
    assert(validate("http://abcd.com") == Some("https://abcd.com"))
    // bare IP in the TLS set
    assert(validate("8.8.8.8") == Some("https://8.8.8.8"))
    assert(validate("http://8.8.8.8") == Some("https://8.8.8.8"))
    // protocol-relative wmc-style URL
    assert(validate("//commons.wikimedia.org/wiki/User:potato") ==
      Some("https://commons.wikimedia.org/wiki/User:potato"))
    // unknown TLD -> None
    assert(validate("foo.notarealtld/x") == None)
    // empty -> None
    assert(validate("") == None)
    // userinfo ignored for validation, kept in the repaired URL;
    // TLS lookup sees through it too
    assert(validate("user:pw@abcd.com/img") ==
      Some("https://user:pw@abcd.com/img"))
    // port kept, validated alongside the suffix
    assert(validate("example.com:8080/g?id=1") ==
      Some("https://example.com:8080/g?id=1"))
  }

  test("validate_url_string trailing-slash flag") {
    val u = "https://wordpress.org/photos/photo/5262839486/"
    assert(validate(u) == Some("https://wordpress.org/photos/photo/5262839486"))
    assert(validate(u, stripSlash = false) == Some(u))
  }

  test("url validation stays inside whole-stage codegen") {
    val docs = Tables(spark, sfDir, "documents")
      .select(Urls.validateUrlString(concat(lit("example.com/d/"),
        col("doc_id"))).as("v"))
    assert(docs.queryExecution.executedPlan.toString.contains("*(1)"))
    assert(docs.filter(col("v").isNotNull).count() > 0)
  }
}
