package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Data-quality expectation suite: each planted violation is counted
  * exactly once, verdicts follow the counts, and the plan does one
  * batch scan for the fused row-local checks plus one broadcast
  * anti-join for the referential check.
  */
class DqChecksSpec extends SparkSpec {

  test("drift monitor: homogeneous corpus stays under threshold; a " +
    "crafted vocabulary shift fires the flag; identical halves score 0") {
    import spark.implicits._
    val out = Introspect.driftMonitor.build(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.keySet === Set("arrival_halves", "lang_mix"))
    out.values.foreach { case (chi2, drifted) =>
      assert(chi2 > 0 && !drifted,
        s"homogeneous corpus must not flag drift (got $chi2)")
    }
    // crafted shift: sample B concentrates on buckets sample A never
    // uses — the scaled-χ² mass approaches the theoretical ceiling
    val a = (0L until 64L).map(b => (b, 10L)).toDF("bucket", "cnt")
    val b = (64L until 128L).map(b => (b, 10L)).toDF("bucket", "cnt")
    val shifted = Introspect.driftStat(a, b).head.getLong(0)
    assert(shifted > Introspect.DriftThreshold,
      s"disjoint-vocabulary shift must flag (got $shifted)")
    // and the statistic is a true zero on identical distributions
    assert(Introspect.driftStat(a, a).head.getLong(0) === 0L)
  }

  test("each planted violation is found; verdicts follow the counts") {
    val out = Introspect.dqChecks.build(spark, sf001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.keySet === Set("null_custkey", "invalid_status",
      "nonpositive_totalprice", "duplicate_orderkey", "fk_orphan_custkey"))
    val orders = graft.Tables.orders(spark, sf001)
    val n = orders.count() + 6 // six crafted rows
    // the source table is clean, so each count is exactly the planted one
    assert(out("null_custkey") === ((1L, n, false)))
    assert(out("invalid_status") === ((1L, n, false)))
    assert(out("nonpositive_totalprice") === ((1L, n, false)))
    assert(out("duplicate_orderkey") === ((1L, n, false)))
    // fk orphans: the planted -999999 plus whatever the source carries
    val srcOrphans = orders
      .join(graft.Tables.customer(spark, sf001),
        col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(out("fk_orphan_custkey")._1 === srcOrphans + 1)
    assert(out("fk_orphan_custkey")._2 === n - 1) // one null custkey unchecked
    assert(out("fk_orphan_custkey")._3 === false)
  }

  test("plan: row-local checks fuse into one scan; FK side broadcasts") {
    val p = Introspect.dqChecks.build(spark, sf001)
      .queryExecution.executedPlan.toString
    // the batch (orders) is scanned twice — row-local aggregate +
    // anti-join probe — five checks must NOT mean five batch scans
    val ordersScans = "orders\\.parquet".r.findAllIn(p).size
    assert(ordersScans <= 2, s"expected <= 2 orders scans, got $ordersScans:\n$p")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"referential check must be a broadcast anti-join:\n$p")
  }
}
