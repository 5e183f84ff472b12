package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Money.centsOf

/** Scale-technique operators: skew-salted join and sketch aggregates.
  * These exist to make the 100 TB patterns first-class, testable
  * citizens rather than tuning folklore.
  */
object Scale {

  /** Salted equi-join: the fact side gets a random-free deterministic
    * salt (hash of its unique row id mod N), the dim side explodes ×N —
    * the standard fix when one join key dominates (at 100 TB: a viral
    * item, a null-heavy key). Result must equal the plain join exactly,
    * which is what the oracle checks; AQE's skew-join split is the
    * runtime alternative, salting is the planned one.
    */
  val saltedJoin: Op = Op(
    "q_salted_join",
    """SELECT o_orderpriority,
      |       COUNT(*) AS n_items,
      |       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val Salts = 8
    val li = Tables.lineitem(spark, dir)
      .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(Salts)))
      .alias("f")
    val o = Tables.orders(spark, dir)
      .withColumn("salt", explode(array((0 until Salts).map(s => lit(s.toLong)): _*)))
      .alias("d")
    li.join(o, col("f.l_orderkey") === col("d.o_orderkey") &&
        col("f.salt") === col("d.salt"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(centsOf(col("l_extendedprice"))).as("sum_cents"))
  }

  /** Quantile sketch next to the exact percentile: at 100 TB the exact
    * percentile (full sort-based aggregation buffer per group) is the
    * expensive path and `approx_percentile` (Greenwald-Khanna summary,
    * mergeable, bounded memory) is what you actually run. Contract
    * mirrors [[approxDistinct]]: exact values verified numerically, the
    * sketch pinned by a boolean the oracle sets TRUE — here "the sketch
    * median lands between the exact p45 and p55", a bound far looser
    * than GK's guaranteed rank error (≤0.1% at accuracy 1000) yet tight
    * enough that a broken sketch fails loudly. Exact percentiles run on
    * integer cents so the interpolation is bit-identical cross-engine
    * (same trick as the sales rollup). */
  val approxQuantile: Op = Op(
    "q_approx_quantile",
    """SELECT l_returnflag,
      |       COUNT(*) AS n,
      |       quantile_cont(CAST(ROUND(l_extendedprice*100) AS BIGINT), 0.5) AS exact_p50_cents,
      |       TRUE AS sketch_within_bounds
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .withColumn("cents", centsOf(col("l_extendedprice")))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        // one percentile buffer for all three quantiles (array form) —
        // three separate percentile() calls would triple the per-group
        // value-multiset aggregation state
        expr("percentile(cents, array(0.45, 0.5, 0.55))").as("ps"),
        expr("approx_percentile(cents, 0.5, 1000)").as("ap"))
      .select(col("l_returnflag"), col("n"),
        element_at(col("ps"), 2).as("exact_p50_cents"),
        (col("ap") >= element_at(col("ps"), 1) &&
          col("ap") <= element_at(col("ps"), 3))
          .as("sketch_within_bounds"))
  }

  /** Sketch aggregates: approx_count_distinct (HLL++) next to the exact
    * count. The sketch value itself is engine-specific, so the CONTRACT
    * the driver verifies is the pinned property: exact counts plus a
    * boolean `within_5pct` that Spark computes honestly from the sketch
    * and the oracle pins to TRUE (HLL++ at rsd=0.02 stays well inside
    * 5%); the spec additionally asserts the numeric relative error. */
  val approxDistinct: Op = Op(
    "q_approx_distinct",
    """SELECT event_type,
      |       COUNT(DISTINCT user_id) AS exact_users,
      |       COUNT(*) AS n,
      |       TRUE AS within_5pct
      |FROM events GROUP BY event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("exact_users"), col("n"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("within_5pct"))
  }
}
