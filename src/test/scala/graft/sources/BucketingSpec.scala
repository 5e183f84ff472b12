package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: the join must plan with no Exchange at
  * all — proof the layout, not the optimizer's runtime shuffle, carries
  * the distribution requirement. */
class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join with zero shuffle exchanges") {
    val li = graft.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val o = graft.Tables.orders(spark, sf001)
      .select(col("o_orderkey"), col("o_orderpriority"))
    // the in-memory catalog is per-JVM but the warehouse dir persists:
    // clear both, or a rerun hits LOCATION_ALREADY_EXISTS
    Seq("b_lineitem", "b_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"/tmp/graft-warehouse/$t"))
    }
    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the join shape that matters at scale: both sides too big to
    // broadcast — co-location must eliminate the shuffle, not a hint
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketing.colocatedJoin(spark,
        "b_lineitem", "l_orderkey", "b_orders", "o_orderkey")
      val p = j.queryExecution.executedPlan.toString()
      assert(!p.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$p")
      assert(p.contains("SortMergeJoin"), s"expected sort-merge join:\n$p")
      // same answer as the plain (shuffled) join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("registered q_colocated_join: the only Exchange is the final groupBy's") {
    // registered-op twin of the gate above: join runs shuffle-free off
    // the bucketed layout; exactly ONE hashpartitioning Exchange remains
    // (the o_orderpriority aggregate — 5 groups, constant-size at any SF)
    val df = graft.operators.Scale.colocatedJoin.build(spark, sf001)
    val p = df.queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1, s"expected exactly 1 Exchange (groupBy), got $exchanges:\n$p")
    assert(p.contains("SortMergeJoin"), s"expected sort-merge join:\n$p")
    assert(p.contains("Bucketed: true"), s"expected bucketed scans:\n$p")
  }

  test("colocatedJoin resolves SAME-named key columns per side") {
    // the typical co-located join shares the key column name on both
    // sides; unqualified col(key) === col(key) would throw
    // AMBIGUOUS_REFERENCE — the join must resolve each key against its
    // own table
    val li = graft.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey").as("order_id"), col("l_extendedprice"))
    val o = graft.Tables.orders(spark, sf001)
      .select(col("o_orderkey").as("order_id"), col("o_orderpriority"))
    Seq("b_li_same", "b_o_same").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"/tmp/graft-warehouse/$t"))
    }
    Bucketing.writeBucketed(li, "b_li_same", "order_id", 8)
    Bucketing.writeBucketed(o, "b_o_same", "order_id", 8)
    val j = Bucketing.colocatedJoin(spark,
      "b_li_same", "order_id", "b_o_same", "order_id")
    val expected = graft.Tables.lineitem(spark, sf001).join(
      graft.Tables.orders(spark, sf001),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(j.count() === expected)
  }
}
