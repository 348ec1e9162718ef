package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-provider percentile-based popularity scoring.
  *
  * Reference semantics (openverse-catalog):
  *  - `catalog/dags/common/popularity/sql.py:202-229` — per-provider
  *    `percentile_disc(p) WITHIN GROUP (ORDER BY metric)` (Postgres
  *    discrete percentile: the smallest actual value whose cumulative
  *    distribution is >= p).
  *  - `catalog/dags/common/popularity/sql.py:249-273` — popularity
  *    constant `((1-p)/p) * max(percentile_value, 1)`.
  *  - `catalog/dags/common/popularity/sql.py:313-326` — standardized
  *    score `metric / (metric + constant)` per row.
  *
  * Scale design: `percentile_disc` is implemented as
  * groupBy(key, value).count → per-key cumulative window over the
  * *distinct values*, NOT by collecting all raw values. At 100 TB the
  * number of distinct (provider, metric_value) pairs is orders of
  * magnitude smaller than row count (the map-side partial aggregation
  * collapses duplicates before the shuffle), and the per-key window sort
  * only sorts distinct values. The reference caches this "heavyweight"
  * computation in a matview with a 6h build budget; here it's a small
  * shuffled aggregate.
  */
object Popularity {

  /** Exact Postgres `percentile_disc(p) WITHIN GROUP (ORDER BY valueCol)`
    * per group of `keys`. Nulls are excluded (Postgres aggregates ignore
    * nulls). Returns one row per key with column `pct`.
    */
  def percentileDisc(df: DataFrame, keys: Seq[String], valueCol: String,
      p: Double): DataFrame = {
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val byKey = Window.partitionBy(keys.map(col): _*)
    val cumW = byKey.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("__cum", sum("__n").over(cumW))
      .withColumn("__tot", sum("__n").over(byKey))
      // smallest value whose cume_dist >= p  <=>  cum >= tot * p
      .filter(col("__cum") >= col("__tot") * lit(p))
      .groupBy(keys.map(col): _*)
      .agg(min(col(valueCol)).as("pct"))
  }

  /** Several exact percentile_disc fractions in ONE pass: the same
    * counts + cumulative window as [[percentileDisc]], then each
    * fraction's "smallest value with cume_dist ≥ p" falls out of a
    * single grouped `min(when(cum ≥ tot·p, value))` — one shuffled
    * aggregate however many cutoffs are asked for (vs one full pass
    * per fraction when calling [[percentileDisc]] repeatedly).
    * Returns one row per key with columns `pct0, pct1, …` in `ps`
    * order.
    */
  def percentileDiscMulti(df: DataFrame, keys: Seq[String],
      valueCol: String, ps: Seq[Double]): DataFrame = {
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val byKey = Window.partitionBy(keys.map(col): _*)
    val cumW = byKey.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pcts = ps.zipWithIndex.map { case (p, i) =>
      min(when(col("__cum") >= col("__tot") * lit(p), col(valueCol)))
        .as(s"pct$i")
    }
    counts
      .withColumn("__cum", sum("__n").over(cumW))
      .withColumn("__tot", sum("__n").over(byKey))
      .groupBy(keys.map(col): _*)
      .agg(pcts.head, pcts.tail: _*)
  }

  /** Popularity constant per key: `((1-p)/p) * (pct == 0 ? 1 : pct)`.
    * Mirrors sql.py:249-273 (zero percentile is clamped to 1 so the
    * constant never degenerates).
    */
  def constants(df: DataFrame, keys: Seq[String], valueCol: String,
      p: Double): DataFrame =
    percentileDisc(df, keys, valueCol, p)
      .withColumn("constant",
        ((lit(1.0) - lit(p)) / lit(p)) *
          when(col("pct") <= lit(0.0), lit(1.0)).otherwise(col("pct")))

  /** Standardized popularity `metric / (metric + constant)` via a
    * broadcast join of the (tiny) per-key constants dimension — the Spark
    * replacement for the reference's per-row scalar-subquery SQL function
    * (sql.py:313-326). Broadcast keeps the 100 TB fact side shuffle-free.
    */
  def score(facts: DataFrame, consts: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    facts
      .join(broadcast(consts.select((keys.map(col) :+ col("constant")): _*)),
        keys, "left")
      .withColumn("score", col(valueCol) / (col(valueCol) + col("constant")))

  /** The "data refresh" job (SURVEY.md §3.3): recompute the constants
    * dimension and the scored snapshot, write both as parquet — the
    * engine's replacement for the reference's matview refresh
    * (popularity/sql.py:249-283, 385-421; production budget: 6 h for
    * constants, up to 21 DAYS for the matview — here it is one
    * broadcast-join pass over the fact table).
    *
    * The snapshot overwrite is the "refresh"; readers swap atomically at
    * the directory level (on a lakehouse format this is a transactional
    * table overwrite).
    */
  /** The metrics-config upsert
    * (refresh_popularity_metrics_task_factory.py:25-95 →
    * popularity/sql.py:139-177): merge incoming (provider, metric,
    * percentile) rows into the config dim — newest non-null wins.
    */
  def updateMetricsConfig(current: DataFrame, incoming: DataFrame)
      : DataFrame =
    MergeUpsert.merge(current, incoming, Seq("provider"))

  def refreshViews(facts: DataFrame, keys: Seq[String], valueCol: String,
      p: Double, outDir: String): Map[String, Any] = {
    val consts = constants(facts, keys, valueCol, p)
    consts.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/popularity_constants")
    // A13 — run metrics ride the job itself via observe() (no second
    // pass over the data), the Spark-native accumulator surface
    val obs = org.apache.spark.sql.Observation("popularity_refresh")
    score(facts, consts, keys, valueCol)
      .observe(obs, count(lit(1)).as("rows_scored"),
        sum(when(col("score").isNull, 1L).otherwise(0L)).as("null_scores"))
      .write.mode("overwrite").parquet(s"$outDir/media_view")
    obs.get
  }

  /** The refresh as a TRANSACTION: constants and scored snapshot commit
    * as versioned tables (graft.sources.VersionedTable), so a reader
    * mid-scan keeps its resolved version while the pointer flips — the
    * lake equivalent of the reference's `REFRESH MATERIALIZED VIEW
    * CONCURRENTLY` swap, plus time travel to prior refreshes. Returns
    * the observe() metrics and both committed versions.
    */
  def refreshViewsVersioned(facts: DataFrame, keys: Seq[String],
      valueCol: String, p: Double, tableRoot: String): Map[String, Any] = {
    import graft.sources.VersionedTable
    val consts = constants(facts, keys, valueCol, p)
    val vConsts = VersionedTable.commit(consts.coalesce(1),
      s"$tableRoot/popularity_constants")
    val obs = org.apache.spark.sql.Observation("popularity_refresh_v")
    val scored = score(facts, consts, keys, valueCol)
      .observe(obs, count(lit(1)).as("rows_scored"),
        sum(when(col("score").isNull, 1L).otherwise(0L)).as("null_scores"))
    // a refresh REPLACES the snapshot (new version), it does not merge
    val vView = VersionedTable.commit(scored, s"$tableRoot/media_view")
    obs.get ++ Map("constants_version" -> vConsts, "view_version" -> vView)
  }
}
