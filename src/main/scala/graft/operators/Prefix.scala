package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.CacheHandle

/** Distributed global prefix sums, and the training-data operator they
  * enable: fixed-context sequence packing.
  *
  * Spark expresses a GLOBAL running total as
  * `sum(v).over(Window.orderBy(k))` — but a window with a global order
  * and no partition key collapses the whole input into ONE partition
  * (Catalyst even warns). Fine for a dimension table, fatal for a
  * corpus: at 100 TB that single partition is the job. The classic
  * two-phase scan fixes it (cf. Blelloch, "Prefix Sums and Their
  * Applications", CMU-CS-90-190):
  *
  *   1. range-shuffle on the order key, so partition i holds a
  *      contiguous key range and all of partition i's keys sort before
  *      partition i+1's;
  *   2. per-partition running sums in parallel (a partition-local
  *      window);
  *   3. one tiny aggregate — each partition's total — prefix-summed on
  *      the driver-side scale (<= #partitions rows) and broadcast back
  *      as each partition's starting offset.
  *
  * Total cost: one range shuffle + one narrow pass + a |partitions|-row
  * side plan. The sequential dependency that makes prefix sums "hard"
  * to distribute is confined to the offsets frame, which is O(cluster
  * width), not O(data).
  */
object Prefix {

  /** Global inclusive running total of `value` in ascending `orderCol`
    * order, as column `outCol` (long).
    *
    * `orderCol` values must be UNIQUE: ties that straddle a range-
    * partition boundary would make the within-partition order (and so
    * every tied row's running value) partitioning-dependent. With
    * unique keys the result is exactly the single-partition window's,
    * at any partition count.
    *
    * The ranged frame is persisted + materialized internally (it is
    * consumed by both the offsets aggregate and the final join — see
    * [[CacheHandle.eager]]); pass a live `caches` handle to release it
    * after materializing downstream output.
    */
  def globalRunningTotal(df: DataFrame, orderCol: String, value: Column,
      outCol: String, numPartitions: Int = 0,
      caches: CacheHandle = CacheHandle.session): DataFrame = {
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val part = CacheHandle.eager(caches.track(
      df.withColumn("__v", value.cast("long"))
        .repartitionByRange(n, col(orderCol))
        .withColumn("__pid", spark_partition_id())
        .persist()))
    // exclusive prefix of per-partition totals: <= n rows, so the
    // unpartitioned window here is a deliberate single-task plan over
    // cluster-width data, not corpus data
    val offsets = part.groupBy("__pid").agg(sum(col("__v")).as("__t"))
      .withColumn("__off", coalesce(
        sum(col("__t")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    val w = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    part.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, sum(col("__v")).over(w) + col("__off"))
      .drop("__pid", "__v")
  }

  /** Fixed-context sequence packing: lay documents end-to-end in
    * ascending `idCol` order and chop the token stream into
    * consecutive training contexts of `contextLen` tokens — the
    * pretraining batch-assembly step (documents are concatenated and
    * split across context windows; nothing is padded or dropped).
    *
    * Output: one row per (document, context window it occupies) —
    *   doc (= idCol), n_tokens, tok_start (the document's global
    *   offset in the token stream), bin_id (= window index), and the
    *   [bin_tok_start, bin_tok_end) global token span the document
    *   covers inside that window. A document longer than `contextLen`
    *   spans several windows; a window boundary mid-document splits it
    *   (standard packing semantics — the attention mask, not the
    *   packer, handles document boundaries).
    *
    * Scale shape: [[globalRunningTotal]] for the offsets (range
    * shuffle + narrow pass), then a per-row explode into the
    * ceil(span/contextLen) <= 2 + n_tokens/contextLen windows the
    * document touches — no join, no second shuffle. Zero-token /
    * null-text documents are dropped (they occupy no span).
    */
  def packSequences(df: DataFrame, idCol: String, tokens: Column,
      contextLen: Long,
      caches: CacheHandle = CacheHandle.session): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive: $contextLen")
    val withN = df.withColumn("n_tokens", tokens.cast("long"))
    globalRunningTotal(withN, idCol, col("n_tokens"), "cum_tokens",
        caches = caches)
      .filter(col("n_tokens") > 0)
      .withColumn("tok_start", col("cum_tokens") - col("n_tokens"))
      .withColumn("bin_id", explode(sequence(
        expr(s"tok_start div ${contextLen}L"),
        expr(s"(cum_tokens - 1) div ${contextLen}L"))))
      .withColumn("bin_tok_start",
        greatest(col("tok_start"), col("bin_id") * contextLen))
      .withColumn("bin_tok_end",
        least(col("cum_tokens"), (col("bin_id") + 1) * contextLen))
      .select(col(idCol).as("doc"), col("n_tokens"), col("tok_start"),
        col("bin_id"), col("bin_tok_start"), col("bin_tok_end"))
  }
}
