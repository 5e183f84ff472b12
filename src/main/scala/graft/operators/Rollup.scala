package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Money.centsOf
import graft.functions.Ladders.confidenceGrade

/** Sales rollup (reference scripts/pricing/10_rollup_market_values_daily.mjs):
  * sliding time window (P4), exact percentiles (A1), latest-sale-per-group
  * (J6/W4 decorrelated), confidence grade (A4).
  *
  * Role mapping: events = market_sales_comps — user_id→card_key,
  * event_type→grade, value→sold_price_usd, ts→sold_at. The reference
  * window is 180 days; the testdata events span 30 days, so the
  * registered query uses 14 days — the operator takes the window as a
  * parameter.
  *
  * Determinism: the window anchor is max(event date) in the data (the
  * reference anchors at now(), which can never hash-match an oracle);
  * "latest sale" totalizes its order with event_id. Timestamps are
  * compared at DATE granularity — safe under both events-file
  * encodings (ns, where Spark truncates to µs while DuckDB keeps ns,
  * and the current µs).
  *
  * Scale notes: one shuffle on (card_key, grade); percentile is an exact
  * sort-based aggregate per group — group cardinality is the key count,
  * values per group are bounded by the window, so memory per group is
  * bounded. The latest-sale rank and the percentile aggregate reuse the
  * SAME hash partitioning (both key on card_key+grade), so AQE plans a
  * single exchange.
  */
object Rollup {

  def salesRollup(windowDays: Int)(
      spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").as("card_key"),
        col("event_type").as("grade"),
        centsOf(col("value")).as("sold_cents"),
        to_date(col("ts")).as("sold_date"),
        col("event_id"))
    // two-phase anchor (cheap max probe → literal bound) so the window
    // filter is a pushable literal predicate, not a join condition
    val anchorDate = ev.agg(max(col("sold_date")).as("a")).head.getDate(0)
    val lo = java.sql.Date.valueOf(anchorDate.toLocalDate.minusDays(windowDays))
    val recent = ev.filter(col("sold_date") >= lit(lo))
    // "Latest sale" is max_by over the same grouping — decorrelated into
    // the ONE aggregate (SURVEY §2.3 J6) instead of a second window pass
    // + join: one shuffle on (card_key, grade) total, and the max_by
    // partial-aggregates map-side. Ordering key (sold_date, event_id) is
    // unique, so the pick is total and engines agree.
    // one percentile buffer for all three quantiles (array form) instead
    // of three copies of the per-group value buffer
    recent.groupBy(col("card_key"), col("grade")).agg(
        percentile(col("sold_cents"),
          array(lit(0.5), lit(0.25), lit(0.75))).as("pct"),
        count(lit(1)).as("sales_count"),
        max(col("sold_date")).as("last_sale_date"),
        max_by(col("sold_cents"), struct(col("sold_date"), col("event_id")))
          .as("last_sale_cents"))
      .select(col("card_key"), col("grade"),
        element_at(col("pct"), 1).as("median_cents"),
        element_at(col("pct"), 2).as("p25_cents"),
        element_at(col("pct"), 3).as("p75_cents"),
        col("sales_count"), col("last_sale_date"), col("last_sale_cents"),
        confidenceGrade(col("sales_count")).as("confidence"))
  }

  val rollup: Op = Op(
    "q_sales_rollup",
    """WITH sales AS (
      |  SELECT user_id AS card_key, event_type AS grade,
      |         CAST(ROUND(value*100) AS BIGINT) AS sold_cents,
      |         CAST(ts AS DATE) AS sold_date, event_id
      |  FROM events
      |), anchor AS (SELECT max(sold_date) AS a FROM sales),
      |recent AS (
      |  SELECT s.* FROM sales s, anchor
      |  WHERE s.sold_date >= anchor.a - INTERVAL 14 DAY
      |), agg AS (
      |  SELECT card_key, grade,
      |         quantile_cont(sold_cents, 0.5) AS median_cents,
      |         quantile_cont(sold_cents, 0.25) AS p25_cents,
      |         quantile_cont(sold_cents, 0.75) AS p75_cents,
      |         COUNT(*) AS sales_count,
      |         max(sold_date) AS last_sale_date
      |  FROM recent GROUP BY card_key, grade
      |), last AS (
      |  SELECT card_key, grade, sold_cents AS last_sale_cents FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY card_key, grade
      |      ORDER BY sold_date DESC, event_id DESC) AS rn
      |    FROM recent) WHERE rn = 1
      |)
      |SELECT agg.card_key, agg.grade, median_cents, p25_cents, p75_cents,
      |       sales_count, last_sale_date, last_sale_cents,
      |       CASE WHEN sales_count >= 10 THEN 'A' WHEN sales_count >= 5 THEN 'B'
      |            WHEN sales_count >= 2 THEN 'C' ELSE 'D' END AS confidence
      |FROM agg JOIN last
      |  ON agg.card_key IS NOT DISTINCT FROM last.card_key
      | AND agg.grade IS NOT DISTINCT FROM last.grade""".stripMargin)(
    // the oracle's decomposed agg⋈last twin must join NULL-SAFELY: the
    // engine's single decorrelated aggregate keeps NULL (card_key,
    // grade) groups — a USING join in the twin silently dropped them
    // (adversarial dim 8, r12: events with NULL user/type/value)
    salesRollup(14))

  /** P3/P4/F6-F9: dynamic date-range predicate + interval arithmetic
    * (ref 03_build_market_price_daily.js:84-102 "index-friendly" WHERE;
    * 10_rollup:36 sliding window). Two-phase like the reference's CLI
    * flag → WHERE-clause builder: a cheap max-date probe first, then the
    * real plan with LITERAL bounds — a literal predicate reaches the
    * parquet scan as a pushed filter (row-group stats skip), where a
    * join against a computed anchor cannot push anything. At 100 TB
    * with date-partitioned data this is partition pruning: ~90 days
    * read instead of all of history.
    */
  val dateWindowAgg: Op = Op(
    "q_date_window",
    """WITH anchor AS (SELECT CAST(max(o_orderdate) AS DATE) AS a FROM orders)
      |SELECT o_orderpriority,
      |       COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders, anchor
      |WHERE CAST(o_orderdate AS DATE) >= anchor.a - INTERVAL 90 DAY
      |  AND CAST(o_orderdate AS DATE) < anchor.a
      |GROUP BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
    val anchor = o.agg(max(to_date(col("o_orderdate"))).as("a")).head.getDate(0)
    // bounds on the RAW timestamp column (to_date(ts) ∈ [lo, hi) ⟺
    // ts ∈ [lo 00:00, hi 00:00) under the UTC session) — a predicate on
    // a derived to_date() column would not reach the scan
    val lo = java.sql.Timestamp.valueOf(anchor.toLocalDate.minusDays(90).atStartOfDay)
    val hi = java.sql.Timestamp.valueOf(anchor.toLocalDate.atStartOfDay)
    o.filter(col("o_orderdate") >= lit(lo) && col("o_orderdate") < lit(hi))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(centsOf(col("o_totalprice"))).as("total_cents"))
  }
}
