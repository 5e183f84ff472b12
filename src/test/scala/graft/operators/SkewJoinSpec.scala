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

  test("measured hot set genuinely splits the corpus (both salting paths run)") {
    val li = graft.Tables.lineitem(spark, sf001)
    // the op's own knobs: 1.25 × median(=4 items/order) → threshold 5
    val hot = Scale.hotKeys(li, "l_orderkey",
      skewFactor = 1.25, minHot = 3L).count()
    val all = li.select(col("l_orderkey")).distinct().count()
    // a hot set that degenerates to all-hot (the old ×8 dim blow-up)
    // or all-cold (salting never exercised) would fail here
    assert(hot > 0, "no hot keys — the salted path never runs")
    assert(all - hot > hot, "most keys must stay cold — that's the point")
  }

  test("hotKeys finds the measured viral key and nothing else") {
    import spark.implicits._
    // 200 uniform keys × 4 rows + one viral key with 5000 rows:
    // median key count 4, default skewFactor 5 → threshold 20
    val uniform = spark.range(800).select(($"id" % 200).as("k"))
    val viral = spark.range(5000).select(lit(777L).as("k"))
    val fact = uniform.unionByName(viral)
    val hot = Scale.hotKeys(fact, "k").as[Long].collect().toSet
    assert(hot === Set(777L))
    // no skew → empty hot set, the join would run entirely unsalted
    assert(Scale.hotKeys(uniform, "k").count() === 0L)
    // EMPTY fact → NULL median percentile → still the documented
    // "no skew" degenerate case, not an NPE
    assert(Scale.hotKeys(uniform.limit(0), "k").count() === 0L)
  }

  test("autoSaltedJoin equals the plain join on a measured-skew corpus") {
    import spark.implicits._
    val fact = spark.range(10000).select(
      when($"id" < 9000, 42L).otherwise($"id" % 50).as("k"),
      ($"id" * 3).as("v"))
    val dim = spark.range(50).select($"id".as("dk"), ($"id" + 100).as("w"))
    val salted = Scale.autoSaltedJoin(fact, "k", dim, "dk",
        tiebreakers = Seq("k", "v"))
      .groupBy($"dk").agg(count(lit(1)).as("n"), sum($"v").as("sv"),
        sum($"w").as("sw"))
    val plain = fact.join(dim, $"k" === $"dk")
      .groupBy($"dk").agg(count(lit(1)).as("n"), sum($"v").as("sv"),
        sum($"w").as("sw"))
    assert(salted.as[(Long, Long, Long, Long)].collect().sortBy(_._1)
      .toSeq === plain.as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq)
  }
}
