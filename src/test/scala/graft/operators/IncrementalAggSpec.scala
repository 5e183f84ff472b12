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

  test("sketch MV: union-of-sketches estimate EQUALS the whole-corpus " +
    "sketch estimate per day (merge is exact on register state)") {
    val events = graft.Tables.events(spark, sf001)
    val merged = IncrementalAgg.sketchRefresh(
        IncrementalAgg.daySketch(
          events.filter(col("event_id") % IncrementalAgg.DeltaMod =!= 0)),
        events.filter(col("event_id") % IncrementalAgg.DeltaMod === 0))
      .select(col("day"), hll_sketch_estimate(col("sk")).as("est"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val direct = IncrementalAgg.daySketch(events)
      .select(col("day"), hll_sketch_estimate(col("sk")).as("est"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(merged.nonEmpty && merged === direct,
      "merged sketch registers diverged from the single-shot sketch")
  }

  test("sketch MV: estimates within 5% of exact; store holds BINARY " +
    "sketches and is reused on a second refresh") {
    val out = IncrementalAgg.sketchMv.build(spark, sf001).collect()
    assert(out.length > 5)
    assert(out.forall(_.getBoolean(2)), "an estimate left the 5% band")
    val store = IncrementalAgg.sketchStore(spark, sf001)
    assert(store.schema("sk").dataType ===
      org.apache.spark.sql.types.BinaryType,
      "the at-rest sketch column must be the raw HLL bytes")
    val sig = new org.apache.hadoop.fs.Path(
      s"${SinkOps.stagingDir(sf001, "mv_sketch")}/_SRC_SIG")
    val fs = sig.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.getFileStatus(sig).getModificationTime
    IncrementalAgg.sketchMv.build(spark, sf001).count()
    assert(fs.getFileStatus(sig).getModificationTime === before,
      "second refresh rebuilt the standing sketch store")
  }

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
