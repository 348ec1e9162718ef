package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named
  * query over the driver's testdata tables, with an equivalent DuckDB
  * oracle SQL for hash-match verification.
  */
object SparkEntry {

  val packs: Seq[QueryPack] = Seq(
    RelationalQueries, PopularityQueries, LoadQueries,
    CleaningQueries, DedupeQueries, TextQueries,
    SimilarityQueries, EventQueries, EnrichmentQueries,
    FunnelQueries, MaintenanceQueries, SamplingQueries)

  private val allQueries: Seq[Q] = packs.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The popularity-scoring pipeline: exact percentile_disc →
    * constants → broadcast-join standardized scores (SURVEY §3.3).
    */
  def entry(spark: SparkSession): DataFrame =
    PopularityQueries.q12.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.collect { case Q(n, _, Some(sql)) =>
      n -> sql.stripMargin.trim.replaceAll("\\s+", " ")
    }.toMap
}
