package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Time travel through the commit manifest: the as-of read must return
  * exactly the pre-delta state even after later commits, and the
  * registered op's reconciliation must match a from-source recompute.
  */
class TimeTravelSpec extends SparkSpec {

  test("as-of read returns the pre-delta state, untouched by the new commit") {
    val out = SinkOps.timeTravel.build(spark, sf001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val orders = graft.Tables.orders(spark, sf001)
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val oldExpect = agg(orders.filter(col("o_orderkey") % 10 =!= 0))
    val newExpect = agg(orders)
    assert(out.keySet === newExpect.keySet)
    out.foreach { case (prio, (nOld, cOld, nNew, cNew, nAdded)) =>
      assert((nOld, cOld) === oldExpect(prio), s"old state drifted for $prio")
      assert((nNew, cNew) === newExpect(prio), s"new state drifted for $prio")
      assert(nAdded === nNew - nOld && nAdded > 0,
        s"delta must be positive for $prio (the two versions really differ)")
    }
    // the as-of read itself, after the op committed both versions:
    // still exactly v_old
    import graft.sources.TxCommit
    val root = SinkOps.stagingDir(sf001, "timetravel")
    val vOld = TxCommit.versions(spark, root).head
    val asOf = TxCommit.readAsOf(spark, root, "stats", vOld)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(asOf === oldExpect, "readAsOf must replay the committed old state")
  }
}
