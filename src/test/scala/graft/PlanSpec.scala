package graft

import org.apache.spark.sql.functions._

/** Plan-quality regression guards: the physical plans we shipped are
  * the plans we want — broadcasts where intended, filters and column
  * pruning pushed into the parquet scans, no stray cartesian products.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q01: filter and column pruning reach the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    // projection pruned: orderkey/partkey/suppkey not read
    assert(p.contains("ReadSchema") && !p.contains("l_partkey"))
  }

  test("q02: dimension joins broadcast") {
    val p = plan("q02_star_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q12: constants dimension broadcasts against the fact scan") {
    val p = plan("q12_popularity_scores")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q30: query side is the broadcast build side") {
    val p = plan("q30_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin BuildLeft"))
  }

  test("aggregations use partial (map-side) aggregation") {
    val p = plan("q22_exact_dedup")
    // two HashAggregate levels (partial + final) around the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("whole-stage codegen covers the cleaning projections") {
    val p = plan("q17_sanitize_strings")
    // "*(n)" prefixes mark whole-stage-codegen'd operators
    assert(p.contains("*(1)"))
  }
}
