package graft

import org.apache.spark.sql.functions._
import graft.cc.CommonCrawl
import graft.streaming.EventStreams

/** Specs for the Common Crawl extraction module and the stateful
  * streaming sessionizer.
  */
class CcStreamSpec extends SparkSpec {
  import spark.implicits._

  test("CommonCrawl extractLinks filters CC links and parses components") {
    val wat = Seq(
      """{"url":"https://blog.example.com/post/1","content_digest":"d1","warc_id":"w1",
        |"links":[{"path":"A@/href","url":"https://creativecommons.org/licenses/by/4.0/"},
        |{"path":"A@/href","url":"https://other.org/x"},
        |{"path":"IMG@/src","url":"http://creativecommons.org/publicdomain/zero/1.0/"}]}"""
        .stripMargin.replaceAll("\n", ""),
      """{"url":"https://news.example.org/a","content_digest":"d2","warc_id":"w1",
        |"links":[{"path":"A@/href","url":"https://news.example.org/b"}]}"""
        .stripMargin.replaceAll("\n", ""),
      """not json at all""")
    val links = CommonCrawl.extractLinks(spark, wat.toDS())
    val rows = links.orderBy("licence_path").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("provider_domain") == "blog.example.com"))
    assert(rows.head.getAs[String]("licence_path") == "/licenses/by/4.0/")
    assert(rows.last.getAs[String]("licence_path") == "/publicdomain/zero/1.0/")
    val stats = CommonCrawl.linkStats(links).collect()
    assert(stats.forall(_.getAs[Long]("n_pages") == 1L))
  }

  test("stateful sessionizer matches the batch lag/cumsum formulation") {
    // batch-mode flatMapGroupsWithState over the real events table
    val evs = Tables(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[EventStreams.Ev]
    val gap = 1800000000L
    val sessions = EventStreams.sessionize(evs, gap)
    // closed sessions only (open per-user tails are retained in state),
    // so compare against the batch q33 sessions MINUS each user's last
    val batch = graft.queries.EventQueries.q33.run(spark, sfDir)
    val lastPerUser = batch.groupBy("user_id")
      .agg(max("session").as("session"))
    val closedBatch = batch.join(lastPerUser,
      Seq("user_id", "session"), "left_anti")
    val got = sessions.toDF()
      .select(col("user_id"), col("n_events"),
        (col("end_us") - col("start_us")).as("dur_us"))
    val exp = closedBatch.select(col("user_id"), col("n_events"),
      col("dur_us"))
    assert(got.count() == exp.count())
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }
}
