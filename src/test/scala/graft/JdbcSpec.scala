package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.Jdbc

/** S9 smoke path: a real `format("jdbc")` round trip against embedded
  * Derby (in-memory, dockerless — the driver ships on every Spark
  * classpath). Covers write, whole read, range-partitioned parallel
  * read, and filter pushdown into the generated SQL.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("jdbc: write, read back, partitioned read, filter pushdown") {
    val df = (1L to 100L).map(i => (i, s"name$i", i * 10))
      .toDF("id", "name", "score")
    Jdbc.write(df, url, "people", SaveMode.Overwrite)

    // whole read round-trips values
    val back = Jdbc.read(spark, url, "people")
    assert(back.count() == 100)
    assert(back.agg(sum("score")).as[Long].head() == (1L to 100L).map(_ * 10).sum)

    // partitioned read: 4 concurrent range scans, same data
    val part = Jdbc.readPartitioned(spark, url, "people", "id",
      lower = 1, upper = 100, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
    // bounds shape parallelism, not filtering: out-of-range rows survive
    Jdbc.write(Seq((999L, "straggler", 0L)).toDF("id", "name", "score"),
      url, "people", SaveMode.Append)
    assert(Jdbc.readPartitioned(spark, url, "people", "id", 1, 100, 4)
      .count() == 101)

    // predicate pushdown reaches the JDBC scan (DB does the filtering)
    val filtered = back.filter(col("score") > 500).select("id")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("score"), plan)
    assert(filtered.count() == 50)
  }

  test("postgres merge SQL: golden upsert from the shared strategy table") {
    import graft.sources.{PgMergeSql, UpsertStrategy => S}
    // a compact table exercising every strategy once
    val cols = Seq(
      "created_on" -> S.NoChange,
      "updated_on" -> S.Now,
      "provider" -> S.NewestNonNull,
      "foreign_identifier" -> S.NewestNonNull,
      "url" -> S.NewestNonNull,
      "meta_data" -> S.MergeJsonbObjects,
      "tags" -> S.MergeJsonbArrays,
      "genres" -> S.MergeArray,
      "removed_from_source" -> S.AlwaysFalse)
    val got = PgMergeSql.upsertSql("image", "load_image_123", cols)
    val expected =
      """INSERT INTO image AS old
        |(url, created_on, updated_on, provider, foreign_identifier, meta_data, tags, genres, removed_from_source)
        |SELECT DISTINCT ON (url) url,
        |  created_on, NOW(), provider, foreign_identifier, meta_data, tags, genres, 'f'
        |FROM load_image_123 as new
        |WHERE NOT EXISTS (
        |  SELECT url FROM image
        |  WHERE url = new.url
        |    AND MD5(foreign_identifier) <> MD5(new.foreign_identifier))
        |ON CONFLICT (provider, md5(foreign_identifier))
        |DO UPDATE SET
        |updated_on = NOW(),
        |provider = COALESCE(EXCLUDED.provider, old.provider),
        |foreign_identifier = COALESCE(EXCLUDED.foreign_identifier, old.foreign_identifier),
        |url = COALESCE(EXCLUDED.url, old.url),
        |meta_data = COALESCE(
        |  jsonb_strip_nulls(old.meta_data) || jsonb_strip_nulls(EXCLUDED.meta_data),
        |  EXCLUDED.meta_data, old.meta_data),
        |tags = COALESCE(
        |  (SELECT jsonb_agg(DISTINCT x)
        |   FROM jsonb_array_elements(old.tags || EXCLUDED.tags) t(x)),
        |  EXCLUDED.tags, old.tags),
        |genres = COALESCE(
        |  (SELECT array_agg(DISTINCT x)
        |   FROM unnest(old.genres || EXCLUDED.genres) t(x)),
        |  EXCLUDED.genres, old.genres),
        |removed_from_source = 'f'""".stripMargin
    assert(got == expected, s"golden mismatch:\n$got")
    // the full image table generates with every reference column and
    // the no_change column absent from DO UPDATE
    val full = PgMergeSql.upsertSql("image", "load_image_123")
    assert(PgMergeSql.imageColumns.map(_._1).forall(full.contains))
    assert(!full.split("DO UPDATE SET")(1).contains("created_on"))
    // the SAME table drives the Spark merge: no_change keeps the old
    // value, newest_non_null takes the incoming one
    import graft.operators.MergeUpsert
    val target = Seq(("p1", "f1", "2020-01-01", "old-title"))
      .toDF("provider", "foreign_identifier", "created_on", "title")
    val staged = Seq(("p1", "f1", "2024-06-06", "new-title"))
      .toDF("provider", "foreign_identifier", "created_on", "title")
    val strategies = PgMergeSql.sparkStrategies(Seq(
      "created_on" -> S.NoChange, "title" -> S.NewestNonNull))
    val merged = MergeUpsert.merge(target, staged,
      Seq("provider", "foreign_identifier"), strategies).collect().head
    assert(merged.getAs[String]("created_on") == "2020-01-01")
    assert(merged.getAs[String]("title") == "new-title")
  }
}
