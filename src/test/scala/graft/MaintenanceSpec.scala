package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Maintenance
import graft.sources.VersionedTable

/** The add_license_url one-shot (maintenance/add_license_url.py:59-132):
  * pair-map backfill semantics plus the transactional write-back through
  * VersionedTable.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def table() = Seq(
    // (identifier, license, version, meta present?)
    ("a", "CC0", "1.0", false),   // uppercase + null meta -> backfilled
    ("b", "by", "2", false),      // bare "2" -> 2.0 normalization
    ("c", "by", "4.0", true),     // meta present -> untouched
    ("d", "wrong", "1.0", false), // unknown pair -> untouched (invalid)
    ("e", "pdm", "1.0", false))   // special-case path
    .toDF("identifier", "license", "license_version", "has_meta")
    .withColumn("meta_data", when(col("has_meta"),
      map(lit("w"), lit("x"))).otherwise(
      lit(null).cast("map<string,string>")))
    .drop("has_meta")

  test("addLicenseUrl backfills null-meta rows from the pair map") {
    val out = Maintenance.addLicenseUrl(table())
      .select(col("identifier"), col("license"),
        element_at(col("meta_data"), "license_url").as("lu"),
        col("meta_data").isNull.as("still_null"))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(out("a") == (("cc0",
      "https://creativecommons.org/publicdomain/zero/1.0/", false)))
    assert(out("b") == (("by",
      "https://creativecommons.org/licenses/by/2.0/", false)))
    // existing meta_data untouched (no license_url key added)
    assert(out("c") == (("by", null, false)))
    // unknown pair: left for the invalid-items report, license NOT lowered
    assert(out("d") == (("wrong", null, true)))
    assert(out("e") == (("pdm",
      "https://creativecommons.org/publicdomain/mark/1.0/", false)))
  }

  test("backfill composes with the transactional table write-back") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_maint").toString
    VersionedTable.commit(table(), root)
    val fixed = Maintenance.addLicenseUrl(
      VersionedTable.read(spark, root))
    val v2 = VersionedTable.mergeInto(spark, root, fixed,
      Seq("identifier"))
    assert(v2 == 2L)
    val after = VersionedTable.read(spark, root)
    assert(after.count() == 5)
    assert(after.filter(col("meta_data").isNull).count() == 1) // only "d"
    // time travel: v1 still has the 4 null-meta rows
    assert(VersionedTable.read(spark, root, Some(1L))
      .filter(col("meta_data").isNull).count() == 4)
  }

  test("writeZordered round-trip: per-file z ranges are disjoint and " +
    "files are internally sorted") {
    import graft.operators.Layout
    val path = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString + "/t"
    val df = Tables(spark, sfDir, "lineitem")
    Layout.writeZordered(df, col("l_partkey"), col("l_suppkey"),
      numFiles = 4, path = path)
    val back = spark.read.parquet(path)
    assert(back.count() == df.count())
    // z recomputed from the keys matches the stored z (layout did not
    // corrupt data)
    assert(back.filter(
      Layout.zValue(col("l_partkey"), col("l_suppkey")) =!= col("z"))
      .count() == 0)
    // per-file [min(z), max(z)] ranges must not overlap — that
    // disjointness IS what makes min/max file pruning effective
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length > 1)                   // actually split files
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("Profile.table: per-column stats match direct recomputes; nulls counted") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Some("a"), Some(10)),
      (2L, None, Some(10)),
      (3L, Some("b"), None),
      (4L, Some("a"), Some(30))
    ).toDF("id", "s", "v")
    val prof = graft.operators.Profile.table(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    assert(prof("id") == ((4L, 4L, 4L, "1", "4")))
    assert(prof("s") == ((4L, 3L, 2L, "a", "b")))
    assert(prof("v") == ((4L, 3L, 2L, "10", "30")))
    // one-pass profile equals column-at-a-time aggregation on real data
    val orders = Tables(spark, sfDir, "orders")
    val got = graft.operators.Profile.table(orders,
      Seq("o_orderkey", "o_orderstatus")).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    for (c <- Seq("o_orderkey", "o_orderstatus")) {
      val Array(nn, nd) = orders
        .agg(count(col(c)), countDistinct(col(c))).collect()(0)
        .toSeq.map(_.asInstanceOf[Long]).toArray
      assert(got(c) == ((nn, nd)), s"col $c")
    }
  }

  test("Profile.tableApprox: same schema as table, exact below k, " +
      "no Expand in the plan (the flagged 100 TB swap, r18)") {
    import org.apache.spark.sql.functions._
    val orders = Tables(spark, sfDir, "orders")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus")
    val exact = graft.operators.Profile.table(orders, cols)
    val approx = graft.operators.Profile.tableApprox(orders, cols,
      k = 1024)
    // same names and types (nullability may differ: the KMV estimate's
    // cast is conservatively nullable where countDistinct is not)
    assert(approx.schema.map(f => (f.name, f.dataType)) ==
      exact.schema.map(f => (f.name, f.dataType)))
    val ex = exact.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    val ap = approx.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    for (c <- cols) {
      // rows/non-null/min/max are EXACT either way
      assert(ap(c)._1 == ex(c)._1 && ap(c)._2 == ex(c)._2, s"col $c")
      assert(ap(c)._4 == ex(c)._4 && ap(c)._5 == ex(c)._5, s"col $c")
      // distinct: exact below k, within 15% above (k=1024 ⇒ ~3% σ)
      if (ex(c)._3 < 1024) assert(ap(c)._3 == ex(c)._3, s"col $c exact")
      else assert(math.abs(ap(c)._3 - ex(c)._3).toDouble / ex(c)._3
        < 0.15, s"col $c: est ${ap(c)._3} vs ${ex(c)._3}")
    }
    // the whole point: the sketch form has no Expand (mergeable
    // aggregates only), where the exact form multiplies the scan
    val planApprox = approx.queryExecution.executedPlan.toString
    val planExact = exact.queryExecution.executedPlan.toString
    assert(!planApprox.contains("Expand"), planApprox.take(400))
    assert(planExact.contains("Expand"))
  }
}
