package graft

import org.apache.spark.sql.functions._
import graft.core.Records
import graft.metrics.RecordMetrics
import graft.operators.{MergeUpsert, Popularity}
import graft.sources.Tsv

/** Specs for typed records, run metrics, metrics-config upsert, and
  * bucketed co-located joins.
  */
class CoreSpec extends SparkSpec {
  import spark.implicits._

  test("typed audio columns parse tags/audio_set/alt_files/genres") {
    val row = Seq((
      """[{"name":"jazz","provider":"jamendo"},{"name":"x","provider":"p"}]""",
      """{"title":"Set","foreign_landing_url":"https://l","thumbnail":null,
         "creator":"c","creator_url":null,"foreign_identifier":"s1"}"""
        .replaceAll("\n\\s*", ""),
      """[{"url":"https://a.mp3","filesize":10,"bit_rate":320,"sample_rate":44100}]""",
      "{rock,jazz}"))
      .toDF("tags", "audio_set", "alt_files", "genres")
    val typed = Records.typedAudioColumns(row).head()
    assert(typed.getAs[collection.Seq[org.apache.spark.sql.Row]]("tags_typed")
      .map(_.getString(0)).toSeq == Seq("jazz", "x"))
    assert(typed.getAs[org.apache.spark.sql.Row]("audio_set_typed")
      .getAs[String]("title") == "Set")
    assert(typed.getAs[collection.Seq[org.apache.spark.sql.Row]]("alt_files_typed")
      .head.getAs[Int]("bit_rate") == 320)
    assert(typed.getAs[collection.Seq[String]]("genres_typed").toSeq ==
      Seq("rock", "jazz"))
  }

  test("PG array literal round-trips, including commas/quotes/nulls") {
    import graft.core.Records
    val arrs: Seq[Seq[String]] = Seq(
      Seq("rock", "prog rock"),
      Seq("a,b", "it's", null),
      Seq(),
      null)
    val df = arrs.toDF("arr")
    val lit_ = df.select(Records.toPgArray(col("arr")).as("pg"))
    val got = lit_.select(col("pg")).as[Option[String]].collect().toSeq
    // exact reference format: JSON-encoded elements inside braces
    assert(got(0) == Some("""{"rock", "prog rock"}"""))
    assert(got(1) == Some("""{"a,b", "it's", null}"""))
    assert(got(2) == Some("{}"))
    assert(got(3) == None)
    val back = lit_.select(Records.fromPgArray(col("pg")).as("arr"))
      .as[Option[Seq[String]]].collect().toSeq
    assert(back.map(_.map(_.toList)) ==
      arrs.map(Option(_).map(_.toList)))
    // legacy unquoted literals still parse via the split fallback
    val legacy = Seq("{a,b}").toDF("pg")
      .select(Records.fromPgArray(col("pg")).as("arr"))
      .as[Seq[String]].head()
    assert(legacy.toList == List("a", "b"))
  }

  test("RecordMetrics derives the funnel and adds across batches") {
    val staged = Seq(("p", "f1", "u1"), ("p", "f1", "u2"), ("p", null, "u3"),
      ("p", "f2", "u1")).toDF("provider", "fid", "url")
    val req = MergeUpsert.filterRequired(staged, Seq("fid", "url"))
    val fidded = MergeUpsert.dedupeByKey(req,
      Seq(col("provider"), md5(col("fid"))), col("url"))
    val urled = MergeUpsert.dedupeByKey(fidded, Seq(col("url")), col("fid"))
    val m = RecordMetrics.fromStages(staged, req, fidded, urled)
    // f1's survivor (u1) collides with f2's url (u1) → one url dup
    assert(m == RecordMetrics(staged = 4, missing = 1, fidDup = 1,
      urlDup = 1, upserted = 1))
    assert((m + m).staged == 8)
    assert(m.report("p").contains("upserted=1"))
  }

  test("metrics-config upsert: incoming percentile wins, others persist") {
    val current = Seq(("flickr", "views", 0.85), ("nappy", "downloads", 0.85))
      .toDF("provider", "metric", "percentile")
    val incoming = Seq(("flickr", "views", 0.90), ("jamendo", "listens", 0.85))
      .toDF("provider", "metric", "percentile")
    val merged = Popularity.updateMetricsConfig(current, incoming)
      .orderBy("provider").as[(String, String, Double)].collect().toSeq
    assert(merged == Seq(("flickr", "views", 0.90),
      ("jamendo", "listens", 0.85), ("nappy", "downloads", 0.85)))
  }

  test("typed Aggregator combines metrics across a Dataset") {
    import graft.functions.TypedAggregators
    import graft.metrics.RecordMetrics
    val batches = Seq(
      RecordMetrics(10, 1, 2, 0, 7), RecordMetrics(5, 0, 1, 1, 3)).toDS()
    val total = batches.select(TypedAggregators.metricsTotal.toColumn).head()
    assert(total == RecordMetrics(15, 1, 3, 1, 10))
  }

  test("tuning: stats-driven shuffle sizing, scoped conf override") {
    import graft.core.Tuning
    val li = Tables(spark, sfDir, "lineitem")
    // a tiny byte target wants several partitions, a huge target
    // collapses to 1
    val small = Tuning.shufflePartitionsFor(li, targetBytes = 64L << 10)
    assert(small > 1)
    assert(Tuning.shufflePartitionsFor(li, targetBytes = 1L << 40) == 1)
    // unknown stats (LogicalRDD defaults to Long.MaxValue sizeInBytes)
    // must SATURATE at max, not truncate through toLong.toInt to 1 —
    // the largest inputs are exactly the ones that need many partitions
    val unknown = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.IntegerType))))
    assert(Tuning.shufflePartitionsFor(unknown, max = 4096) == 4096)
    // estimate scales with column pruning
    val pruned = Tuning.shufflePartitionsFor(
      li.select("l_orderkey"), targetBytes = 64L << 10)
    assert(pruned <= small)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val inside = Tuning.withShufflePartitions(spark, 7) {
      spark.conf.get("spark.sql.shuffle.partitions")
    }
    assert(inside == "7")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity")
      val o = Tables(spark, sfDir, "orders")
        .select("o_orderkey", "o_totalprice")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_b")
      o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("o_b")
      val joined = spark.table("li_b")
        .join(spark.table("o_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: no shuffle on either side
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(joined.count() == li.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("ORC sink + scan round-trips and pushes filters down") {
    import org.apache.spark.sql.functions._
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
    // predicate pushdown reaches the ORC scan like the parquet paths
    val plan = back.filter(col("l_orderkey") === 42)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(l_orderkey,42)"), plan.take(800))
  }
}
