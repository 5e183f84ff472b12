package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Materialized-aggregate refresh: algebraic merge must equal the full
  * recompute, the standing store must be reused across invocations,
  * and overlap days must really combine both sides (otherwise the
  * merge degenerates to a disjoint union and proves nothing).
  */
class IncrementalAggSpec extends SparkSpec {

  private def keyed(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      r.getDate(r.fieldIndex("day")).toString ->
        ((r.getLong(r.fieldIndex("n_orders")),
          r.getLong(r.fieldIndex("sum_cents"))))
    }.toMap

  test("refresh == full recompute; avg derived at read") {
    val got = IncrementalAgg.mvRefresh.build(spark, sf001)
    val full = graft.Tables.orders(spark, sf001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
    assert(keyed(got) === keyed(full), "merged view drifted from recompute")
    got.collect().foreach { r =>
      assert(r.getLong(r.fieldIndex("avg_cents")) ===
        r.getLong(r.fieldIndex("sum_cents")) / r.getLong(r.fieldIndex("n_orders")))
    }
  }

  test("standing store is reused, not rebuilt, on a second refresh") {
    IncrementalAgg.mvRefresh.build(spark, sf001).count()
    val store = SinkOps.stagingDir(sf001, "mv_agg")
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listing = fs.listStatus(new org.apache.hadoop.fs.Path(store))
      .map(s => s.getPath.getName -> s.getModificationTime).sortBy(_._1).toSeq
    val before = listing
    IncrementalAgg.mvRefresh.build(spark, sf001).count()
    assert(listing === before, "second refresh must not rewrite the base store")
  }

  test("overlap days merge contributions from base and delta") {
    val base = IncrementalAgg.baseStore(spark, sf001)
    val deltaRows = graft.Tables.orders(spark, sf001)
      .filter(col("o_orderkey") % IncrementalAgg.DeltaMod === 0)
    val delta = deltaRows
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
    val overlap = base.select("day").intersect(delta.select("day"))
    assert(overlap.count() > 0, "fixture must have days present in both sides")
    val merged = keyed(IncrementalAgg.refresh(base, deltaRows)
      .select("day", "n_orders", "sum_cents"))
    val b = keyed(base)
    val d = keyed(delta)
    overlap.collect().map(_.getDate(0).toString).foreach { day =>
      assert(merged(day)._1 === b(day)._1 + d(day)._1, s"count merge broke $day")
      assert(merged(day)._2 === b(day)._2 + d(day)._2, s"sum merge broke $day")
    }
  }
}
