package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew handling, both flavors the engine offers: planned (hot-key-only
  * salting in [[Scale.saltedJoin]]) and runtime (AQE's skew-join
  * split). The oracle proves the salted join's VALUES; these specs pin
  * the skew mechanics themselves.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed shuffle-join partition (skew=true in final plan)") {
    import spark.implicits._
    val conf = spark.conf
    val savedBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedThreshold = conf.get(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB")
    val savedAdvisory = conf.get(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    try {
      // force a shuffled join and scale AQE's skew thresholds down to
      // test-sized data; factor stays at its default 5× median
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // one viral key carries 250k of 300k fact rows; cold rows spread
      // over the rest of the dim's key space. Payload columns are
      // hash-valued so the hot partition's shuffle blocks don't
      // compress away below the skew threshold (sizes are measured on
      // compressed map output).
      val fact = spark.range(300000).select(
        when($"id" < 250000, 0L).otherwise($"id" % 1000).as("k"),
        // bounded hashes: incompressible low bits (so the hot shuffle
        // partition keeps its real size) without ANSI sum overflow
        pmod(xxhash64($"id"), lit(1000000L)).as("v"),
        pmod(xxhash64($"id", $"id"), lit(1000000L)).as("v2"))
      val dim = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum($"w").as("sw"), sum($"v").as("sv"))
      val n = joined.collect().head.getLong(0)
      assert(n === 300000L) // every fact row matches exactly one dim row
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split in:\n$plan")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedBroadcast)
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        savedThreshold)
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", savedAdvisory)
    }
  }

  test("hot-key threshold genuinely splits the corpus (both salting paths run)") {
    val li = graft.Tables.lineitem(spark, sf001)
    val counts = li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
    val hot = counts.filter(col("n") > Scale.HotKeyThreshold).count()
    val cold = counts.filter(col("n") <= Scale.HotKeyThreshold).count()
    // a threshold that degenerates to all-hot (the old ×8 dim blow-up)
    // or all-cold (salting never exercised) would fail here
    assert(hot > 0, "no hot keys — the salted path never runs")
    assert(cold > hot, "most keys must stay cold — that's the point")
  }
}
