package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Money.centsOf

/** Analytics operators that generalize the reference's query shapes to a
  * proper star schema: multi-way joins (J1/J3), top-k per group (the k=1
  * case is the reference's W1/O3 — ref 03_build:169), JSON-column
  * extraction (S5/P9 — ref 02_normalize:82,88).
  */
object Analytics {

  /** Star join: region⋈nation⋈customer dims broadcast onto the
    * orders⋈lineitem fact join. The only real shuffle is
    * lineitem⋈orders on orderkey; at 100 TB both facts would be
    * bucketed/co-partitioned on orderkey making that shuffle-free too,
    * and the dim joins stay broadcast at any fact scale.
    */
  val starJoin: Op = Op(
    "q_star_join",
    """SELECT r_name, n_name,
      |       COUNT(*) AS n_items,
      |       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
      |                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_units
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val dims = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    li.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        sum(centsOf(col("l_extendedprice")) *
          (lit(100) - centsOf(col("l_discount")))).as("revenue_units"))
  }

  /** Top-k per group (generalizes W1/O3 from k=1): top 3 parts by revenue
    * within each brand, rank order totalized by partkey so ties are
    * deterministic. The pre-aggregation shrinks the window input from
    * |lineitem| to |part| rows BEFORE the rank shuffle — the difference
    * between sorting 100 TB and sorting the catalog.
    */
  val topKPerGroup: Op = Op(
    "q_topk_per_group",
    """WITH partrev AS (
      |  SELECT p_brand, p_partkey,
      |         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY p_brand, p_partkey
      |), ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand
      |    ORDER BY revenue_cents DESC, p_partkey ASC) AS rk
      |  FROM partrev
      |)
      |SELECT p_brand, p_partkey, revenue_cents, rk
      |FROM ranked WHERE rk <= 3""".stripMargin) { (spark, dir) =>
    val partrev = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(sum(centsOf(col("l_extendedprice"))).as("revenue_cents"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("revenue_cents").desc, col("p_partkey").asc)
    partrev.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
  }

  /** S5/P9/F23: schema-on-read JSON — key-existence filter + typed
    * extraction from a JSON string column (ref `payload ? 'prices'` and
    * `->>`, 02_normalize:82-88). `get_json_object` returns NULL on
    * malformed/missing — the reference's tolerant-parse semantics (F23).
    */
  val jsonExtract: Op = Op(
    "q_json_extract",
    """SELECT event_type,
      |       COUNT(*) AS n,
      |       CAST(SUM(k) AS BIGINT) AS sum_k,
      |       CAST(MIN(k) AS BIGINT) AS min_k,
      |       CAST(MAX(k) AS BIGINT) AS max_k
      |FROM (
      |  SELECT event_type,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events
      |  WHERE json_extract_string(props, '$.k') IS NOT NULL)
      |GROUP BY event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
  }
}
