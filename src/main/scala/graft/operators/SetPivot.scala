package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Money.centsOf

/** Set operations + reshaping beyond the reference surface (the
  * reference has UNION-by-dispatch only, SURVEY §2.7): INTERSECT /
  * EXCEPT, pivot (the inverse of the reference's U1 unpivot), and
  * ROLLUP grouping sets.
  *
  * Scale notes: Spark plans INTERSECT/EXCEPT as aggregate + join on the
  * full row — one shuffle each, same key. Pivot with an explicit value
  * list is a single groupBy (map-side partial agg); never call pivot
  * without the list at scale, or the distinct-values job reads the
  * whole input twice. ROLLUP expands to grouping sets BEFORE the
  * shuffle, so partial aggregation still applies per set.
  */
object SetPivot {

  /** Customers active in both halves of 1997 (INTERSECT) vs only the
    * first half (EXCEPT), tagged and unioned. */
  val intersectExcept: Op = Op(
    "q_intersect_except",
    """WITH h1 AS (
      |  SELECT DISTINCT o_custkey FROM orders
      |  WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      |    AND CAST(o_orderdate AS DATE) < DATE '1997-07-01'
      |), h2 AS (
      |  SELECT DISTINCT o_custkey FROM orders
      |  WHERE CAST(o_orderdate AS DATE) >= DATE '1997-07-01'
      |    AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      |)
      |SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2)
      |UNION ALL
      |SELECT 'h1_only', o_custkey FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2)""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
      .withColumn("od", to_date(col("o_orderdate")))
    def half(lo: String, hi: String) =
      o.filter(col("od") >= lit(lo).cast("date") && col("od") < lit(hi).cast("date"))
        .select(col("o_custkey")).distinct()
    val h1 = half("1997-01-01", "1997-07-01")
    val h2 = half("1997-07-01", "1998-01-01")
    h1.intersect(h2).select(lit("both").as("tag"), col("o_custkey"))
      .unionByName(
        h1.except(h2).select(lit("h1_only").as("tag"), col("o_custkey")))
  }

  /** Pivot: revenue cents per linestatus × returnflag — the inverse of
    * the reference's U1 unpivot (02_normalize:101-153). Explicit value
    * list ⇒ single-pass plan. */
  val pivotFlags: Op = Op(
    "q_pivot",
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN l_returnflag='R' THEN CAST(ROUND(l_extendedprice*100) AS BIGINT) END) AS BIGINT) AS r_cents,
      |  CAST(SUM(CASE WHEN l_returnflag='A' THEN CAST(ROUND(l_extendedprice*100) AS BIGINT) END) AS BIGINT) AS a_cents,
      |  CAST(SUM(CASE WHEN l_returnflag='N' THEN CAST(ROUND(l_extendedprice*100) AS BIGINT) END) AS BIGINT) AS n_cents
      |FROM lineitem
      |GROUP BY l_linestatus""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("R", "A", "N"))
      .agg(sum(centsOf(col("l_extendedprice"))))
      .withColumnsRenamed(Map("R" -> "r_cents", "A" -> "a_cents", "N" -> "n_cents"))
  }

  /** ROLLUP (region, nation) revenue with grouping flags — subtotal and
    * grand-total rows distinguished from genuine NULL keys. */
  val rollupRevenue: Op = Op(
    "q_rollup_sets",
    """SELECT r_name, n_name,
      |       CAST(GROUPING(r_name) AS INT) * 2 + CAST(GROUPING(n_name) AS INT) AS gid,
      |       COUNT(*) AS n_orders,
      |       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)""".stripMargin) { (spark, dir) =>
    val joined = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
    joined.rollup(col("r_name"), col("n_name"))
      .agg(
        (grouping(col("r_name")) * 2 + grouping(col("n_name"))).cast("int")
          .as("gid"),
        count(lit(1)).as("n_orders"),
        sum(centsOf(col("o_totalprice"))).as("total_cents"))
      .select("r_name", "n_name", "gid", "n_orders", "total_cents")
  }

  /** CUBE over (returnflag, linestatus): all four grouping combinations
    * in one pass — Spark expands the grouping sets BEFORE the shuffle,
    * so partial aggregation still combines map-side per set; the
    * expansion factor is the set count (4), not the data. Completes the
    * grouping-sets family next to ROLLUP. */
  val cubeRevenue: Op = Op(
    "q_cube",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING(l_returnflag) AS INT) * 2
      |         + CAST(GROUPING(l_linestatus) AS INT) AS gid,
      |       COUNT(*) AS n_items,
      |       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("int").as("gid"),
        count(lit(1)).as("n_items"),
        sum(centsOf(col("l_extendedprice"))).as("sum_cents"))
      .select("l_returnflag", "l_linestatus", "gid", "n_items", "sum_cents")
  }

  /** Decile bucketing with `ntile` — the rank-family member the other
    * window ops don't cover: orders split into 10 equal-frequency value
    * buckets per order priority, reported as per-bucket ranges. The
    * window partitions by priority (bounded cardinality — each
    * partition sorts in parallel); ntile's frame is the whole
    * partition, so this is one shuffle + one sort, and the bucket
    * summary collapses it to 10 rows per priority before anything
    * leaves the executor. */
  val ntileDeciles: Op = Op(
    "q_ntile",
    """WITH b AS (
      |  SELECT o_orderpriority,
      |         CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents,
      |         ntile(10) OVER (PARTITION BY o_orderpriority
      |                         ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT), o_orderkey) AS decile
      |  FROM orders
      |)
      |SELECT o_orderpriority, decile, COUNT(*) AS n_orders,
      |       MIN(cents) AS min_cents, MAX(cents) AS max_cents
      |FROM b GROUP BY o_orderpriority, decile""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val cents = centsOf(col("o_totalprice"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(cents.asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), cents.as("cents"),
        ntile(10).over(w).as("decile"))
      .groupBy(col("o_orderpriority"), col("decile"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
  }
}
