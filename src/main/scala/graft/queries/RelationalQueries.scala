package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational operator coverage (SURVEY.md §2.1/2.3–2.7): scans,
  * grouped aggregation, the star join, semi/anti joins, window dedup /
  * running sums / top-k, set ops, and the explode+self-join hierarchy
  * pattern.
  *
  * All money/quantity aggregates accumulate in DECIMAL and only cast to
  * DOUBLE at the end — decimal sums are order-independent, so results are
  * bit-identical regardless of partitioning (and match the DuckDB oracle
  * exactly). Raw double passthrough columns are exact by construction.
  */
object RelationalQueries extends QueryPack {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** A-family: grouped aggregation with decimal accumulation (the
    * pricing-summary shape; covers A4/A10-style count/sum metrics).
    */
  val q01 = Q("q01_pricing_summary",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus"""))

  /** J1 — the 5-way star join (iNaturalist shape,
    * transformed_table.template.sql:55-67): fact tables shuffle on their
    * keys, the small dims (nation/region) broadcast so the 100 TB side
    * never reshuffles for them.
    */
  val q02 = Q("q02_star_join",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      // r18 (guide §2.3 "aggregate before you shuffle"): lineitem —
      // the 100 TB side — pre-aggregates to ONE row per order before
      // any join, so (a) every downstream join and exchange moves
      // |orders-with-lineitems| rows instead of |lineitems|, (b) the
      // countDistinct(o_orderkey) collapses to count(*) — each
      // surviving order contributes exactly one row (o_orderkey unique
      // in orders, c_custkey unique in customer, dim keys unique), so
      // the distinct-aggregate machinery drops out of the plan
      // entirely. Revenue is unchanged: per-order decimal sums summed
      // again are the same exact decimal total (sum is associative;
      // same result type decimal(38,4) → double). Oracle SQL is
      // untouched — hash-verified at sf0.001/0.01/0.1.
      val liAgg = li.groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .as("order_revenue"))
      liAgg.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          sum(col("order_revenue")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
    },
    Some("""
      SELECT r_name, n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(DISTINCT o_orderkey) AS n_orders
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name"""))

  /** J2/J7 — anti join (NOT EXISTS): customers with no high-value order. */
  val q03 = Q("q03_anti_join",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > lit(400000.0))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n_customers
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > CAST(400000.0 AS DOUBLE))
      GROUP BY c_mktsegment"""))

  /** Semi join (EXISTS): customers with at least one big order. */
  val q04 = Q("q04_semi_join",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > lit(50000.0))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > CAST(50000.0 AS DOUBLE))"""))

  /** W2/W3/J8 — deterministic newest-row-per-key dedup (the DISTINCT ON /
    * ctid replacement, loader/sql.py:220-237 + popularity/sql.py:341-357).
    */
  val q05 = Q("q05_latest_per_key",
    (s, dir) => {
      val e = Tables(s, dir, "events")
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "value")
    },
    Some("""
      SELECT user_id, event_type, event_id, value
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
              ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      WHERE rn = 1"""))

  /** W1 — running sum with an explicit ROWS frame (taxa.sql:125-128). */
  val q06 = Q("q06_running_sum",
    (s, dir) => {
      val e = Tables(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.select(col("event_id"), col("user_id"),
        sum(dec(col("value"))).over(w).cast("double").as("run_total"))
    },
    Some("""
      SELECT event_id, user_id,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
      FROM events"""))

  /** T-family — top-k per group with deterministic tie-break. */
  val q07 = Q("q07_topk_per_group",
    (s, dir) => {
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("o_custkey"), col("rank").cast("long").as("rank"),
          col("o_orderkey"), col("o_totalprice"))
    },
    Some("""
      SELECT o_custkey, CAST(rank AS BIGINT) AS rank, o_orderkey, o_totalprice
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
              row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
            FROM orders)
      WHERE rank <= 3"""))

  /** U1/U2 — set difference both directions + UNION ALL
    * (smithsonian.py:190-196 unit-code reconciliation shape).
    */
  val q08 = Q("q08_set_ops",
    (s, dir) => {
      val c = Tables(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_nationkey").as("n_nationkey")).distinct()
      val p = Tables(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_nationkey").as("n_nationkey")).distinct()
      c.except(p).withColumn("side", lit("customer_only"))
        .unionAll(p.except(c).withColumn("side", lit("supplier_only")))
    },
    Some("""
      SELECT n_nationkey, 'customer_only' AS side FROM
        (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer WHERE c_acctbal < 0
         EXCEPT SELECT DISTINCT s_nationkey AS n_nationkey FROM supplier WHERE s_acctbal < 0)
      UNION ALL
      SELECT n_nationkey, 'supplier_only' AS side FROM
        (SELECT DISTINCT s_nationkey AS n_nationkey FROM supplier WHERE s_acctbal < 0
         EXCEPT SELECT DISTINCT c_nationkey AS n_nationkey FROM customer WHERE c_acctbal < 0)"""))

  /** J5 — hierarchy-ish explode + equi-join (the taxa ancestry expansion
    * rewrite: explode the path, then join — an equi-join after explode
    * beats the reference's nested-loop ANY, taxa.sql:249-251).
    */
  val q09 = Q("q09_explode_join",
    (s, dir) => {
      val p = Tables(s, dir, "part")
      val words = p.select(col("p_partkey"),
        explode(split(col("p_name"), " ")).as("word"))
      val stats = words.groupBy("word").agg(count(lit(1)).as("word_freq"))
      words.join(stats, "word")
        .groupBy("p_partkey")
        .agg(count(lit(1)).as("n_words"), sum("word_freq").as("freq_sum"))
    },
    Some("""
      WITH w AS (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part),
      stats AS (SELECT word, COUNT(*) AS word_freq FROM w GROUP BY word)
      SELECT p_partkey, COUNT(*) AS n_words,
             CAST(SUM(word_freq) AS BIGINT) AS freq_sum
      FROM w JOIN stats USING (word)
      GROUP BY p_partkey"""))

  /** T-family top-k via the bounded-heap native aggregate
    * (functions.TopKRowsAgg): O(k) state per group and map-side partial
    * aggregation — each input partition reduces to ≤k entries per group
    * BEFORE the shuffle, where the window form (q07) shuffles and sorts
    * every row of every group. Same results, deterministic ties.
    */
  val q55 = Q("q55_topk_agg",
    (s, dir) => {
      graft.functions.TopKRowsAgg.register(s)
      Tables(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(expr("top_k_rows(o_totalprice, o_orderkey, 3)").as("top"))
        .select(col("o_custkey"),
          array_join(col("top").cast("array<string>"), ",")
            .as("top_orders"))
    },
    Some("""
      WITH r AS (SELECT o_custkey, o_orderkey, row_number() OVER
          (PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders)
      SELECT o_custkey,
             string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn)
               AS top_orders
      FROM r WHERE rn <= 3 GROUP BY o_custkey"""))

  /** ROLLUP hierarchy totals: per-(flag, status) sums plus per-flag
    * subtotals plus the grand total in ONE aggregation — Spark's
    * `rollup` compiles to a single Expand-fed hash aggregate, not
    * three passes. Decimal accumulation keeps the sums
    * order-independent; NULL grouping cells mark subtotal rows on
    * both engines identically.
    */
  val q92 = Q("q92_rollup",
    (s, dir) => Tables(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n")),
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)"""))

  /** PIVOT event types into columns: one row per event_type bucket of
    * users × per-type counts — Spark's `pivot` with an EXPLICIT value
    * list stays a single aggregation (no distinct-values pre-query,
    * the scale rule for pivots); the oracle is the FILTER-aggregate
    * form the pivot desugars to.
    */
  val q93 = Q("q93_pivot",
    (s, dir) => Tables(s, dir, "events")
      .groupBy((col("user_id") % 10).as("user_bucket"))
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(count(lit(1)))
      .select(col("user_bucket"),
        coalesce(col("click"), lit(0L)).as("click"),
        coalesce(col("view"), lit(0L)).as("view"),
        coalesce(col("purchase"), lit(0L)).as("purchase")),
    Some("""
      SELECT user_id % 10 AS user_bucket,
        COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        COUNT(*) FILTER (WHERE event_type = 'view') AS view,
        COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase
      FROM events GROUP BY user_id % 10"""))

  override def all: Seq[Q] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q55, q92, q93)
}
