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

  // -------------------------------------------------------------------
  // REAL Postgres execution (container ships postgres 15): initdb a
  // throwaway cluster as `nobody` on a unix socket, run the EXACT
  // generated dialect — including the expression conflict target
  // (provider, md5(fid)) and the jsonb/array merge arms DuckDB rejects
  // — and assert the merged rows. This is the reference's own live-SQL
  // test surface (`tests/dags/common/loader/test_sql.py`) for every
  // strategy arm. Gated on the binaries existing.
  // -------------------------------------------------------------------

  private def haveBinaries: Boolean =
    Seq("/usr/local/bin/initdb", "/usr/local/bin/pg_ctl", "/usr/bin/psql",
      "/usr/bin/su").forall(p => Files.isExecutable(Paths.get(p)))

  private def withPostgres[A](f: (String => String) => A): A = {
    import scala.sys.process._
    val base = Files.createTempDirectory("pgexec")
    val sock = base.resolve("sock")
    Files.createDirectories(sock)
    def sh(cmd: String): Int =
      Seq("/bin/sh", "-c", cmd).!(ProcessLogger(_ => (), _ => ()))
    def asNobody(cmd: String): Int =
      Seq("/usr/bin/su", "nobody", "-s", "/bin/sh", "-c", s"cd /; $cmd")
        .!(ProcessLogger(_ => (), _ => ()))
    require(sh(s"chown -R nobody:nogroup $base") == 0, "chown failed")
    require(asNobody(s"initdb -D $base/data -A trust") == 0, "initdb failed")
    require(asNobody(s"pg_ctl -D $base/data -w -l $base/log start " +
      s"""-o "-c listen_addresses='' -c unix_socket_directories='$sock'"""")
      == 0, "pg_ctl start failed")
    try {
      def psql(sql: String): String = {
        val out = new StringBuilder
        val err = new StringBuilder
        val rc = Seq("/usr/bin/psql", "-h", sock.toString, "-U", "nobody",
          "-d", "postgres", "-v", "ON_ERROR_STOP=1", "-At", "-F", "|",
          "-c", sql).!(ProcessLogger(
          o => out.append(o).append('\n'), e => err.append(e).append('\n')))
        assert(rc == 0, s"psql failed: $err\nsql:\n$sql")
        out.toString
      }
      f(psql)
    } finally {
      asNobody(s"pg_ctl -D $base/data -m immediate stop")
      sh(s"rm -rf $base")
    }
  }

  test("every strategy arm (incl. jsonb/array merges) executes on real Postgres") {
    assume(haveBinaries, "postgres binaries not installed")

    val fullCols = Seq(
      "created_on" -> S.NoChange,
      "updated_on" -> S.Now,
      "provider" -> S.NewestNonNull,
      "foreign_identifier" -> S.NewestNonNull,
      "url" -> S.NewestNonNull,
      "title" -> S.NewestNonNull,
      "meta_data" -> S.MergeJsonbObjects,
      "tags" -> S.MergeJsonbArrays,
      "sizes" -> S.MergeArray,
      "removed_from_source" -> S.AlwaysFalse)

    withPostgres { psql =>
      for (t <- Seq("image", "load_t")) psql(
        s"""CREATE TABLE $t (created_on varchar, updated_on timestamp,
           |provider varchar, foreign_identifier varchar, url varchar,
           |title varchar, meta_data jsonb, tags jsonb, sizes text[],
           |removed_from_source boolean)""".stripMargin)
      // the reference's real conflict key: an EXPRESSION index
      psql("CREATE UNIQUE INDEX ON image (provider, md5(foreign_identifier))")

      psql("""INSERT INTO image VALUES
        |('2020-01-01', NOW(), 'p1', 'f1', 'u1', 'old-title',
        | '{"a":"1","b":"2","dead":null}', '["x","y"]', '{s,m}', true),
        |('2020-02-02', NOW(), 'p1', 'f4', 'u4', 'bare',
        | NULL, NULL, NULL, true),
        |('2019-01-01', NOW(), 'p1', 'f9', 'u9', 'keeper',
        | NULL, NULL, NULL, true)""".stripMargin)
      psql("""INSERT INTO load_t VALUES
        |('2099-01-01', NOW(), 'p1', 'f1', 'u1', 'new-title',
        | '{"b":"3","c":"4","gone":null}', '["y","z"]', '{m,l}', false),
        |('2098-01-01', NOW(), 'p1', 'f4', 'u4', 'filled',
        | '{"k":"v"}', '["a"]', '{xl}', false),
        |('2021-01-01', NOW(), 'p1', 'f2', 'u2', 'brand-new',
        | NULL, NULL, '{s}', false),
        |('2022-01-01', NOW(), 'p1', 'f3', 'u9', 'thief',
        | NULL, NULL, NULL, false)""".stripMargin)

      psql(PgMergeSql.upsertSql("image", "load_t", fullCols))

      val rows = psql(
        """SELECT foreign_identifier, created_on, title, meta_data::text,
          |tags::text, array_to_string(sizes, ','),
          |removed_from_source
          |FROM image ORDER BY foreign_identifier""".stripMargin)
        .trim.split('\n').map(_.split('|').toList).toList
      val byFid = rows.map(r => r.head -> r).toMap
      assert(byFid.keySet == Set("f1", "f2", "f4", "f9")) // f3 = url thief, dropped

      def jsonSet(s: String): Set[String] =
        s.stripPrefix("[").stripSuffix("]").split(",").map(_.trim).toSet

      // f1: jsonb objects key-union (nulls stripped both sides, new key
      // wins), jsonb array distinct-union, native array distinct-union
      val f1 = byFid("f1")
      assert(f1(1) == "2020-01-01" && f1(2) == "new-title")
      assert(f1(3).replaceAll("\\s", "") == """{"a":"1","b":"3","c":"4"}""")
      assert(jsonSet(f1(4)) == Set("\"x\"", "\"y\"", "\"z\""))
      assert(f1(5).split(',').toSet == Set("s", "m", "l"))
      assert(f1(6) == "f") // AlwaysFalse reset

      // f4: NULL old side -> COALESCE falls through to EXCLUDED
      val f4 = byFid("f4")
      assert(f4(3).replaceAll("\\s", "") == """{"k":"v"}""")
      assert(jsonSet(f4(4)) == Set("\"a\""))
      assert(f4(5) == "xl")

      // f2: fresh insert, AlwaysFalse insert literal 'f'
      val f2 = byFid("f2")
      assert(f2(1) == "2021-01-01" && f2(6) == "f")
      assert(f2(3) == "" && f2(5) == "s") // NULL jsonb stays NULL

      // f9: untouched keeper
      assert(byFid("f9")(2) == "keeper" && byFid("f9")(6) == "t")
    }

    // the SAME strategy table through the Spark interpreter gives the
    // same merged values for the jsonb/array arms (typed map/array).
    // map_concat with an overlapping key needs LAST_WIN — exactly the
    // "new key wins" dialect semantics (same setting q41 runs under).
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    val names = Seq("provider", "foreign_identifier", "meta_data", "tags",
      "sizes")
    val tDf = Seq(
      ("p1", "f1", Map("a" -> "1", "b" -> "2", "dead" -> null),
        Seq("x", "y"), Seq("s", "m")),
      ("p1", "f4", null.asInstanceOf[Map[String, String]],
        null.asInstanceOf[Seq[String]], null.asInstanceOf[Seq[String]]))
      .toDF(names: _*)
    val sDf = Seq(
      ("p1", "f1", Map("b" -> "3", "c" -> "4", "gone" -> null),
        Seq("y", "z"), Seq("m", "l")),
      ("p1", "f4", Map("k" -> "v"), Seq("a"), Seq("xl")))
      .toDF(names: _*)
    val merged = MergeUpsert.merge(tDf, sDf,
      Seq("provider", "foreign_identifier"),
      PgMergeSql.sparkStrategies(fullCols))
      .orderBy("foreign_identifier").collect()
    val m1 = merged(0)
    assert(m1.getAs[Map[String, String]]("meta_data") ==
      Map("a" -> "1", "b" -> "3", "c" -> "4"))
    assert(m1.getSeq[String](m1.fieldIndex("tags")).toSet ==
      Set("x", "y", "z"))
    assert(m1.getSeq[String](m1.fieldIndex("sizes")).toSet ==
      Set("s", "m", "l"))
    val m4 = merged(1)
    assert(m4.getAs[Map[String, String]]("meta_data") == Map("k" -> "v"))
    assert(m4.getSeq[String](m4.fieldIndex("tags")) == Seq("a"))
    assert(m4.getSeq[String](m4.fieldIndex("sizes")) == Seq("xl"))
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
