package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sketches.kmvSketch]] — KMV distinct-set sketches with
  * set-operation estimates. The oracle replays the integer estimator
  * hash-exactly; what it cannot pin is ACCURACY against the exact
  * cardinalities and the estimator's behavior at the overlap extremes —
  * that lives here. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("estimates land within the 1/sqrt(k) envelope of exact counts") {
    val r = Sketches.kmvSketch.build(spark, sf001).head()
    val o = graft.Tables.orders(spark, sf001)
      .groupBy($"o_custkey")
      .agg(max(when(year($"o_orderdate") <= 1997, 1).otherwise(0)).as("ia"),
        max(when(year($"o_orderdate") >= 1998, 1).otherwise(0)).as("ib"))
    val exactA = o.filter($"ia" === 1).count()
    val exactB = o.filter($"ib" === 1).count()
    val exactI = o.filter($"ia" === 1 && $"ib" === 1).count()
    // sketch-full premise: both slices exceed k distinct ids
    assert(exactA >= Sketches.KmvK && exactB >= Sketches.KmvK,
      "fixture no longer fills the sketches — premise broken")
    def within(est: Long, exact: Long, tol: Double) =
      assert(math.abs(est - exact) <= exact * tol,
        s"estimate $est vs exact $exact beyond ±${tol * 100}%")
    // std error ~ 12.7% at k=64; 25% is a ~2 sigma spec bound
    within(r.getAs[Long]("est_a"), exactA, 0.25)
    within(r.getAs[Long]("est_b"), exactB, 0.25)
    // intersection compounds the union estimate with binomial rho noise
    within(r.getAs[Long]("est_inter"), exactI, 0.35)
  }

  test("identical sets: rho = k and intersection equals the set estimate") {
    val ids = (1L to 500L).toDF("c")
    val r = Sketches.kmvStats(ids, ids).head()
    assert(r.getAs[Long]("rho") === Sketches.KmvK.toLong)
    assert(r.getAs[Long]("est_a") === r.getAs[Long]("est_b"))
    assert(r.getAs[Long]("est_union") === r.getAs[Long]("est_a"))
    // floor-division loss only: inter = rho*est_u/k with rho = k
    assert(r.getAs[Long]("est_inter") === r.getAs[Long]("est_union"))
  }

  test("disjoint sets: rho = 0 and the intersection estimate is zero") {
    val a = (1L to 300L).toDF("c")
    val b = (10001L to 10300L).toDF("c")
    val r = Sketches.kmvStats(a, b).head()
    assert(r.getAs[Long]("rho") === 0L)
    assert(r.getAs[Long]("est_inter") === 0L)
    // the union estimate still sees both sets: it must exceed either
    // single-set estimate (more distincts push the k-th minimum down)
    assert(r.getAs[Long]("est_union") >= r.getAs[Long]("est_a"))
    assert(r.getAs[Long]("est_union") >= r.getAs[Long]("est_b"))
  }

  test("sketch stage plans per-partition top-k, not a global sort") {
    // kmvStats checkpoints the sketches, so the stage's plan is gated
    // on the pre-checkpoint frame kmvSketchOf builds
    val ids = graft.Tables.orders(spark, sf001)
      .select($"o_custkey".as("c"))
    val p = Sketches.kmvSketchOf(ids)
      .queryExecution.executedPlan.toString()
    assert(p.contains("TakeOrderedAndProject"),
      s"min-k must plan TakeOrderedAndProject:\n$p")
    assert(!p.contains("Sort "),
      s"min-k must not plan a global sort:\n$p")
  }
}
