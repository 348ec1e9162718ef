package graft.sources

import org.apache.spark.sql.Column

import graft.operators.MergeUpsert.Strategy

/** Per-column upsert strategy as DATA, with TWO interpreters: the Spark
  * merge expression [[graft.operators.MergeUpsert.merge]] executes, and
  * the Postgres `INSERT … ON CONFLICT` dialect the reference's loader
  * runs against the catalog DB (`catalog/dags/common/loader/sql.py:264-332`,
  * `storage/columns.py:38-99`). One table drives both backends, so the
  * JDBC path (S9) writing to a real Postgres merges identically to the
  * engine's own full-outer-join rewrite — the dialect-parity gap the r8
  * verdict ranked as the top real-user risk.
  */
sealed trait UpsertStrategy {
  /** Spark interpreter: (incoming, existing) => merged. */
  def columnFn: (Column, Column) => Column
  /** Postgres `DO UPDATE SET` fragment (columns.py:38-82 shapes);
    * None = the column does not update on conflict (no_change).
    */
  def conflictSql(c: String): Option[String]
  /** Value selected from the loading table on INSERT
    * (columns.py `upsert_name`: NOW()/'f' literals, else the column).
    */
  def insertValue(c: String): String = c
}

object UpsertStrategy {
  /** newest_non_null: incoming wins unless NULL. */
  case object NewestNonNull extends UpsertStrategy {
    val columnFn = Strategy.newestNonNull _
    def conflictSql(c: String) =
      Some(s"$c = COALESCE(EXCLUDED.$c, old.$c)")
  }
  /** now: refresh the audit timestamp on every touch. */
  case object Now extends UpsertStrategy {
    val columnFn = Strategy.now _
    def conflictSql(c: String) = Some(s"$c = NOW()")
    override def insertValue(c: String) = "NOW()"
  }
  /** false: reset on every touch (removed_from_source). */
  case object AlwaysFalse extends UpsertStrategy {
    val columnFn = Strategy.alwaysFalse _
    def conflictSql(c: String) = Some(s"$c = 'f'")
    override def insertValue(c: String) = "'f'"
  }
  /** merge_jsonb_objects: key-level union, new keys win (MapType). */
  case object MergeJsonbObjects extends UpsertStrategy {
    val columnFn = Strategy.mergeMap _
    def conflictSql(c: String) = Some(
      s"""$c = COALESCE(
         |  jsonb_strip_nulls(old.$c) || jsonb_strip_nulls(EXCLUDED.$c),
         |  EXCLUDED.$c, old.$c)""".stripMargin)
  }
  /** merge_jsonb_arrays: distinct element union (jsonb arrays). */
  case object MergeJsonbArrays extends UpsertStrategy {
    val columnFn = Strategy.mergeArray _
    def conflictSql(c: String) = Some(
      s"""$c = COALESCE(
         |  (SELECT jsonb_agg(DISTINCT x)
         |   FROM jsonb_array_elements(old.$c || EXCLUDED.$c) t(x)),
         |  EXCLUDED.$c, old.$c)""".stripMargin)
  }
  /** merge_array: distinct element union (native arrays). */
  case object MergeArray extends UpsertStrategy {
    val columnFn = Strategy.mergeArray _
    def conflictSql(c: String) = Some(
      s"""$c = COALESCE(
         |  (SELECT array_agg(DISTINCT x)
         |   FROM unnest(old.$c || EXCLUDED.$c) t(x)),
         |  EXCLUDED.$c, old.$c)""".stripMargin)
  }
  /** no_change: set on insert, never updated (created_on). */
  case object NoChange extends UpsertStrategy {
    val columnFn = (_: Column, o: Column) => o
    def conflictSql(c: String) = None
  }
}

object PgMergeSql {
  import UpsertStrategy._

  /** The image table's column → strategy list (db names, identifier
    * surrogate excluded — `db_columns.py:19-45` order,
    * `columns.py:559-720` strategies: JSONColumn defaults to
    * merge_jsonb_objects, TimestampColumn to now; tags/alt_files are
    * explicit merge_jsonb_arrays; created_on no_change; removed false).
    */
  val imageColumns: Seq[(String, UpsertStrategy)] = Seq(
    "created_on" -> NoChange,
    "updated_on" -> Now,
    "ingestion_type" -> NewestNonNull,
    "provider" -> NewestNonNull,
    "source" -> NewestNonNull,
    "foreign_identifier" -> NewestNonNull,
    "foreign_landing_url" -> NewestNonNull,
    "url" -> NewestNonNull,
    "thumbnail" -> NewestNonNull,
    "width" -> NewestNonNull,
    "height" -> NewestNonNull,
    "filesize" -> NewestNonNull,
    "license" -> NewestNonNull,
    "license_version" -> NewestNonNull,
    "creator" -> NewestNonNull,
    "creator_url" -> NewestNonNull,
    "title" -> NewestNonNull,
    "meta_data" -> MergeJsonbObjects,
    "tags" -> MergeJsonbArrays,
    "watermarked" -> NewestNonNull,
    "last_synced_with_source" -> Now,
    "removed_from_source" -> AlwaysFalse,
    "filetype" -> NewestNonNull,
    "category" -> NewestNonNull)

  /** The same table as MergeUpsert.merge strategies — callers drive the
    * Spark merge and the Postgres SQL from ONE source of truth.
    */
  def sparkStrategies(columns: Seq[(String, UpsertStrategy)])
      : Map[String, (Column, Column) => Column] =
    columns.map { case (c, s) => c -> s.columnFn }.toMap

  /** The reference's batch upsert (`loader/sql.py:313-331`), generated
    * from the strategy table:
    *  - INSERT column list leads with the url (uniqueness pivot) and
    *    excludes it from the per-column inserts, as the reference does;
    *  - `DISTINCT ON (url)` picks one staged row per url;
    *  - the NOT EXISTS guard drops staged rows whose url already
    *    belongs to a DIFFERENT logical key (J7's url-conflict filter);
    *  - conflict key `(provider, md5(foreign_identifier))` with one
    *    `DO UPDATE SET` fragment per non-no_change column.
    *
    * `conflictTarget` overrides the conflict key with plain columns for
    * engines that reject expression targets (DuckDB: "Non-column index
    * element not supported"). Explicit target columns are then also
    * dropped from `DO UPDATE SET`: on a conflict they provably equal
    * `EXCLUDED.*` (they ARE the match key), so the Postgres default's
    * `c = COALESCE(EXCLUDED.c, old.c)` on them is a no-op — and engines
    * like DuckDB refuse assignments to constrained columns outright.
    */
  def upsertSql(dbTable: String, loadTable: String,
      columns: Seq[(String, UpsertStrategy)] = imageColumns,
      urlCol: String = "url", fidCol: String = "foreign_identifier",
      providerCol: String = "provider",
      conflictTarget: Option[Seq[String]] = None): String = {
    // fail at construction, not execution: an empty override would emit
    // `ON CONFLICT ()` — a syntax error only surfaced by the database
    require(conflictTarget.forall(_.nonEmpty),
      "conflictTarget override must name at least one column")
    val target = conflictTarget.getOrElse(Seq(providerCol, s"md5($fidCol)"))
    val keyCols = conflictTarget.getOrElse(Nil).toSet
    val inserts = columns.filterNot(_._1 == urlCol)
      .map { case (c, s) => (c, s.insertValue(c)) }
    val conflicts = columns.filterNot(c => keyCols(c._1))
      .flatMap { case (c, s) => s.conflictSql(c) }
    // a target covering every updatable column leaves no assignments —
    // a bare `DO UPDATE SET` is a syntax error; DO NOTHING is the
    // correct degenerate upsert (the row already equals the match key)
    val onConflict =
      if (conflicts.isEmpty) "DO NOTHING"
      else s"DO UPDATE SET\n${conflicts.mkString(",\n")}"
    s"""INSERT INTO $dbTable AS old
       |($urlCol, ${inserts.map(_._1).mkString(", ")})
       |SELECT DISTINCT ON ($urlCol) $urlCol,
       |  ${inserts.map(_._2).mkString(", ")}
       |FROM $loadTable as new
       |WHERE NOT EXISTS (
       |  SELECT $urlCol FROM $dbTable
       |  WHERE $urlCol = new.$urlCol
       |    AND MD5($fidCol) <> MD5(new.$fidCol))
       |ON CONFLICT (${target.mkString(", ")})
       |$onConflict""".stripMargin
  }
}
