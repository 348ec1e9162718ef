package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at scale.
  *
  * At 100 TB a handful of hot keys (one provider with half the rows,
  * one viral page) can pin a single reducer for hours. AQE's skew-join
  * splitting handles the join case at runtime; these helpers cover the
  * aggregation case and the planned (pre-AQE) join case.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(keys ++ salt) partial →
    * groupBy(keys) final. Correct for any algebraic aggregate expressed
    * as (partial, merge) pairs — here the common count/sum case.
    *
    * The partial shuffle spreads each hot key over `saltBuckets`
    * reducers; the final shuffle only carries one row per (key, salt).
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum("__n").as("n"), sum("__s").as("total"))
  }

  /** Salted join for a skewed fact against a small-ish dimension that
    * is too big to broadcast: the fact side gets a random salt in
    * [0, saltBuckets), the dim side is replicated once per salt value,
    * and the join key becomes (key, salt) — splitting each hot key's
    * bucket `saltBuckets` ways.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
