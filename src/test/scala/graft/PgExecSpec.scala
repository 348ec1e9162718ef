package graft

import java.net.URLClassLoader
import java.nio.file.{Files, Path, Paths}
import java.sql.Connection

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row

import graft.operators.MergeUpsert
import graft.sources.{PgMergeSql, UpsertStrategy => S}

/** Executes the GENERATED upsert dialect on a real SQL engine (embedded
  * DuckDB via its JDBC driver, loaded from the pre-warmed coursier cache
  * — no build dependency added) and asserts the merged table equals the
  * engine's own Spark-side merge (`MergeUpsert.urlConflictFilter` +
  * `MergeUpsert.merge`) on identical data. Until now the `INSERT … ON
  * CONFLICT` text was golden-matched + Derby-smoked but never run on an
  * engine that accepts the clause (the reference live-tests its SQL in
  * `tests/dags/common/loader/test_sql.py`).
  *
  * Engine caveats this covers deliberately: DuckDB rejects expression
  * conflict targets and list-column updates, so the executable surface
  * is the scalar strategy core (no_change / now / newest_non_null /
  * false) + `DISTINCT ON` + the url-conflict `NOT EXISTS` guard, with a
  * plain-column `conflictTarget`. The jsonb/array strategies stay
  * golden-text + Spark-interpreter (JdbcSpec) — Postgres-only syntax.
  */
class PgExecSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq(
    "created_on" -> S.NoChange,
    "updated_on" -> S.Now,
    "provider" -> S.NewestNonNull,
    "foreign_identifier" -> S.NewestNonNull,
    "url" -> S.NewestNonNull,
    "title" -> S.NewestNonNull,
    "removed_from_source" -> S.AlwaysFalse)

  private def duckdbJar: Option[Path] = {
    val root = Paths.get(sys.props.getOrElse("user.home", "/root"),
      ".cache", "coursier")
    if (!Files.isDirectory(root)) None
    else {
      val s = Files.walk(root)
      try s.iterator.asScala.find(_.getFileName.toString
        .matches("duckdb_jdbc-.*\\.jar"))
      finally s.close()
    }
  }

  private def withDuckDb[A](f: Connection => A): A = {
    val jar = duckdbJar.getOrElse(fail("duckdb jar not found"))
    val cl = new URLClassLoader(Array(jar.toUri.toURL), getClass.getClassLoader)
    // DriverManager refuses drivers from foreign classloaders —
    // instantiate directly against the JDK's java.sql.Driver interface.
    val drv = cl.loadClass("org.duckdb.DuckDBDriver")
      .getDeclaredConstructor().newInstance().asInstanceOf[java.sql.Driver]
    val conn = drv.connect("jdbc:duckdb:", new java.util.Properties)
    try f(conn) finally conn.close()
  }

  test("generated ON CONFLICT upsert executes on DuckDB and matches MergeUpsert.merge") {
    assume(duckdbJar.isDefined, "duckdb jdbc jar not in the local cache")

    // target rows: f1 will conflict-update, f9 is untouched and owns u9
    val target = Seq(
      ("2020-01-01", "p1", "f1", "u1", "old-title", true),
      ("2019-01-01", "p1", "f9", "u9", "keeper", true))
    // staged: f1 = update path (NULL url exercises COALESCE), f2 = fresh
    // insert, f3 = url thief (u9 belongs to f9 → NOT EXISTS drops it)
    val staged = Seq(
      ("2099-01-01", "p1", "f1", null, "new-title", false),
      ("2021-01-01", "p1", "f2", "u2", "brand-new", false),
      ("2022-01-01", "p1", "f3", "u9", "thief", false))

    val fromDuck = withDuckDb { conn =>
      val st = conn.createStatement()
      def ddl(t: String, unique: String) = st.execute(
        s"""CREATE TABLE $t (created_on VARCHAR, updated_on TIMESTAMP,
           |provider VARCHAR, foreign_identifier VARCHAR, url VARCHAR,
           |title VARCHAR, removed_from_source BOOLEAN$unique)""".stripMargin)
      ddl("image", ", UNIQUE(provider, foreign_identifier)")
      ddl("load_t", "")
      val ins = conn.prepareStatement(
        "INSERT INTO image VALUES (?, NOW(), ?, ?, ?, ?, ?)")
      for ((co, p, f, u, t, r) <- target) {
        Seq(co, p, f, u, t).zipWithIndex.foreach { case (v, i) =>
          ins.setString(i + 1, v) }
        ins.setBoolean(6, r); ins.execute()
      }
      val insL = conn.prepareStatement(
        "INSERT INTO load_t VALUES (?, NOW(), ?, ?, ?, ?, ?)")
      for ((co, p, f, u, t, r) <- staged) {
        Seq(co, p, f, u, t).zipWithIndex.foreach { case (v, i) =>
          insL.setString(i + 1, v) }
        insL.setBoolean(6, r); insL.execute()
      }

      st.execute(PgMergeSql.upsertSql("image", "load_t", cols,
        conflictTarget = Some(Seq("provider", "foreign_identifier"))))

      val rs = st.executeQuery(
        """SELECT created_on, provider, foreign_identifier, url, title,
          |removed_from_source, updated_on IS NOT NULL
          |FROM image ORDER BY foreign_identifier""".stripMargin)
      val out = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getString(1), r.getString(2), r.getString(3),
          r.getString(4), r.getString(5), r.getBoolean(6), r.getBoolean(7)))
        .toList
      rs.close(); st.close()
      out
    }

    // identical pipeline through the engine's own operators
    val names = Seq("created_on", "provider", "foreign_identifier",
      "url", "title", "removed_from_source")
    val tDf = target.toDF(names: _*)
    val sDf = staged.toDF(names: _*)
    val guarded = MergeUpsert.urlConflictFilter(sDf, tDf,
      "url", "foreign_identifier")
    val merged = MergeUpsert.merge(tDf, guarded,
      Seq("provider", "foreign_identifier"),
      PgMergeSql.sparkStrategies(cols))
    val fromSpark = merged
      .orderBy("foreign_identifier")
      .collect().toList.map { r: Row =>
        (r.getAs[String]("created_on"), r.getAs[String]("provider"),
          r.getAs[String]("foreign_identifier"), r.getAs[String]("url"),
          r.getAs[String]("title"), r.getAs[Boolean]("removed_from_source"),
          true) // updated_on is NOW() on both engines — compared as presence
      }

    assert(fromDuck == fromSpark, s"duck=$fromDuck spark=$fromSpark")
    // and the semantics the scenario encodes, explicitly:
    val byFid = fromDuck.map(r => r._3 -> r).toMap
    assert(byFid("f1") == ("2020-01-01", "p1", "f1", "u1", "new-title", false, true))
    assert(byFid("f9") == ("2019-01-01", "p1", "f9", "u9", "keeper", true, true))
    assert(byFid("f2") == ("2021-01-01", "p1", "f2", "u2", "brand-new", false, true))
    assert(!byFid.contains("f3"))
  }

  test("plain-column conflictTarget drops key columns from DO UPDATE only") {
    val sql = PgMergeSql.upsertSql("image", "load_t", cols,
      conflictTarget = Some(Seq("provider", "foreign_identifier")))
    assert(sql.contains("ON CONFLICT (provider, foreign_identifier)"))
    val Array(_, doUpdate) = sql.split("DO UPDATE SET")
    assert(!doUpdate.contains("provider ="))
    assert(!doUpdate.contains("foreign_identifier ="))
    // insert list still carries the key columns
    assert(sql.contains("provider, foreign_identifier"))
    // default target is byte-identical to before (golden covered in JdbcSpec)
    assert(PgMergeSql.upsertSql("image", "load_t", cols)
      .contains("ON CONFLICT (provider, md5(foreign_identifier))"))
  }
}
