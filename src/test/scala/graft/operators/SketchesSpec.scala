package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min sketch invariants: one-sided error for EVERY term, fixed
  * size, elementwise-sum mergeability (the scale claim), and a
  * driver-side replay of the estimate arithmetic.
  */
class SketchesSpec extends SparkSpec {

  private lazy val docs = graft.Tables.documents(spark, sf001)
  private lazy val counts = Sketches.termCounts(docs).cache()
  private lazy val sketch = Sketches.sketchOf(counts).cache()

  test("overcount guarantee: est >= true for every distinct term") {
    val est = Sketches.estimate(counts, sketch)
    val violations = est.filter(col("est_cnt") < col("true_cnt")).count()
    assert(violations === 0, "CMS must never undercount")
    assert(est.count() === counts.count(), "every term must get an estimate")
  }

  test("sketch is fixed-size: <= depth*width cells, exactly depth seeds") {
    assert(sketch.count() <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
    assert(sketch.select(col("seed")).distinct().count() === Sketches.CmsDepth)
    // mass conservation per row: every seed's counters sum to the
    // total token count (each occurrence lands in exactly one bucket)
    val total = counts.agg(sum(col("cnt"))).collect()(0).getLong(0)
    val perSeed = sketch.groupBy(col("seed"))
      .agg(sum(col("bucket_cnt")).as("s")).collect()
    perSeed.foreach(r => assert(r.getLong(1) === total,
      s"seed ${r.getInt(0)} lost mass"))
  }

  test("mergeability: sketch(even docs) + sketch(odd docs) = sketch(all)") {
    val even = Sketches.sketchOf(
      Sketches.termCounts(docs.filter(col("doc_id") % 2 === 0)))
    val odd = Sketches.sketchOf(
      Sketches.termCounts(docs.filter(col("doc_id") % 2 === 1)))
    val merged = even.union(odd)
      .groupBy(col("seed"), col("bucket"))
      .agg(sum(col("bucket_cnt")).as("bucket_cnt"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getInt(0), r.getLong(1)) -> r.getLong(2)
    assert(merged.collect().map(key).toMap === sketch.collect().map(key).toMap,
      "partial sketches must merge by elementwise addition")
  }

  test("estimate replays driver-side from the collected sketch") {
    val cells = sketch.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val M = 1000000007L
    def fp(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % M)
    val got = Sketches.cmsSketch.build(spark, sf001).collect()
    assert(got.length === Sketches.CmsProbes)
    got.foreach { r =>
      val term = r.getString(0)
      val expect = (0 until Sketches.CmsDepth)
        .map(s => cells((s, fp(s"$s:$term") % Sketches.CmsWidth)))
        .min
      assert(r.getLong(2) === expect, s"estimate drifted for '$term'")
      assert(r.getLong(2) >= r.getLong(1))
    }
  }
}
