package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WindowAsofSetSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gap edges — exactly 30min stays, 30min+1us splits") {
    val base = 1700000000000000L // µs
    val gap = 1800000000L
    val df = Seq(
      (1L, 1L, base),
      (1L, 2L, base + gap),          // == gap → same session
      (1L, 3L, base + 2 * gap + 1),  // gap+1 → new session
      (2L, 4L, base)                 // other user independent
    ).toDF("user_id", "event_id", "us")
      .select(col("user_id"), col("event_id"),
        expr("timestamp_micros(us)").as("ts"), lit(0.0).as("value"))
    df.createOrReplaceTempView("__sess_fixture")
    // run the same program as the Op, over the fixture
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"us", $"event_id")
    val sessions = df.select($"user_id", $"event_id", expr("unix_micros(ts)").as("us"))
      .withColumn("new_sess", when(lag($"us", 1).over(w).isNull ||
        $"us" - lag($"us", 1).over(w) > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum($"new_sess").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sid").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sessions === Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("asof join: same-day order counts, max orderkey wins ties, no-prior is null") {
    withAsofFixture { () =>
      val out = AsOf.asofJoin.build(spark, fixtureDir)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      assert(out(100L) === -1L)  // event before any order
      assert(out(101L) === 11L)  // same-day: order 11 > order 10
      assert(out(102L) === 12L)  // later event picks newest prior order
    }
  }

  // Build a tiny parquet dir shaped like the testdata so the Op's
  // build fn runs unchanged against it.
  private val fixtureDir = s"${System.getProperty("java.io.tmpdir")}/graft_asof_fixture"
  private def withAsofFixture(f: () => Unit): Unit = {
    val day = (d: String) => java.sql.Timestamp.valueOf(s"$d 12:00:00")
    Seq(
      (100L, day("2024-01-01"), 7L, "view", 0.0, "{}"),
      (101L, day("2024-01-05"), 7L, "view", 0.0, "{}"),
      (102L, day("2024-01-09"), 7L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("unix_micros(ts) * 1000"))  // ns long, like testdata
      .write.mode("overwrite").parquet(s"$fixtureDir/events.parquet")
    Seq(
      (10L, 7L, "2024-01-05", 100.0, "1-URGENT"),
      (11L, 7L, "2024-01-05", 200.0, "1-URGENT"),
      (12L, 7L, "2024-01-07", 300.0, "1-URGENT")
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "o_orderpriority")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$fixtureDir/orders.parquet")
    f()
  }

  test("asof nearest: closer side wins, equidistant prefers backward, " +
    "backward day-ties take max key, forward day-ties take min key") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_asof_near_fixture"
    val day = (d: String) => java.sql.Timestamp.valueOf(s"$d 12:00:00")
    Seq(
      (200L, day("2024-02-10"), 7L, "view", 0.0, "{}"), // equidistant ±2d
      (201L, day("2024-02-05"), 7L, "view", 0.0, "{}"), // forward strictly closer
      (202L, day("2024-02-08"), 7L, "view", 0.0, "{}"), // same-day backward
      (203L, day("2024-02-20"), 8L, "view", 0.0, "{}"), // forward-only user
      (204L, day("2024-02-20"), 9L, "view", 0.0, "{}")  // no orders at all
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("unix_micros(ts) * 1000"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq(
      (20L, 7L, "2024-02-08", 100.0, "1-URGENT"), // 2d before event 200
      (21L, 7L, "2024-02-08", 110.0, "1-URGENT"), // same day as 20: max key wins
      (22L, 7L, "2024-02-12", 120.0, "1-URGENT"), // 2d after event 200
      (23L, 7L, "2024-02-06", 130.0, "1-URGENT"), // 1d after event 201
      (24L, 7L, "2024-02-06", 140.0, "1-URGENT"), // same day as 23: min key wins fwd
      (25L, 8L, "2024-02-25", 150.0, "1-URGENT")  // only after user 8's event
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "o_orderpriority")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = AsOf.asofNearest.build(spark, dir).collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(5)) Long.MinValue else r.getLong(5)))).toMap
    assert(out(200L) === ((21L, -2L))) // tie ±2d → backward; day-tie → max key
    assert(out(201L) === ((23L, 1L)))  // no prior order: +1d fwd, min key of day
    assert(out(202L) === ((21L, 0L)))  // same-day → backward branch, max key
    assert(out(203L) === ((25L, 5L)))  // forward-only
    assert(out(204L) === ((-1L, Long.MinValue))) // no orders → nulls
  }

  test("rollup: grouping ids distinguish subtotal levels") {
    val out = SetPivot.rollupRevenue.build(spark, sf001)
    val byGid = out.groupBy("gid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byGid.keySet === Set(0, 1, 3))     // detail, per-region, grand
    assert(byGid(3) === 1L)                   // one grand-total row
    val grand = out.filter($"gid" === 3).select($"total_cents").head.getLong(0)
    val detail = out.filter($"gid" === 0).agg(sum($"total_cents"))
      .head.getLong(0)
    assert(grand === detail)                  // levels reconcile
  }

  test("salted join equals plain join") {
    val salted = Scale.saltedJoin.build(spark, sf001)
      .orderBy("o_orderpriority").collect().toSeq
    val plain = graft.Tables.lineitem(spark, sf001)
      .join(graft.Tables.orders(spark, sf001), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(round($"l_extendedprice" * 100).cast("long")).as("sum_cents"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(salted === plain)
  }

  test("pivot columns match conditional-aggregation semantics") {
    val out = SetPivot.pivotFlags.build(spark, sf001)
    val row = out.filter($"l_linestatus" === "F").head
    val manual = graft.Tables.lineitem(spark, sf001)
      .filter($"l_linestatus" === "F" && $"l_returnflag" === "R")
      .agg(sum(round($"l_extendedprice" * 100).cast("long"))).head.getLong(0)
    assert(row.getAs[Long]("r_cents") === manual)
  }

  test("approx_percentile lands inside the exact p45-p55 band") {
    val rows = Scale.approxQuantile.build(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("sketch_within_bounds"),
        s"quantile sketch out of bounds for ${r.getAs[String]("l_returnflag")}")
    }
  }

  test("approx_count_distinct within declared 5% of exact") {
    // the op now exports the pinned-contract flag (the oracle pins it to
    // TRUE); the flag is computed honestly from the HLL++ sketch
    val rows = Scale.approxDistinct.build(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_5pct"),
        s"sketch drifted beyond 5% for ${r.getAs[String]("event_type")}")
    }
  }

  test("gap fill: dense per-user grid, carry-forward, own span only") {
    val out = Windows.gapFill.build(spark, sf001)
      .select($"user_id", $"day".cast("string"), $"cents_filled", $"is_gap")
      .as[(Long, String, Long, Boolean)].collect()
    assert(out.nonEmpty)
    // never a null fill (each user's grid starts on a data day)
    // and per user: grid is contiguous, first day is not a gap
    out.groupBy(_._1).foreach { case (u, rows) =>
      val days = rows.map(_._2).sorted
      val d0 = java.time.LocalDate.parse(days.head)
      days.zipWithIndex.foreach { case (d, i) =>
        assert(java.time.LocalDate.parse(d) == d0.plusDays(i.toLong),
          s"user $u grid not dense at $d")
      }
      assert(!rows.minBy(_._2)._4, s"user $u first grid day marked gap")
    }
    // a gap row carries exactly the previous non-gap value
    val byUser = out.groupBy(_._1)
    val checked = byUser.values.flatMap { rows =>
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).collect {
        case Array(prev, cur) if cur._4 => (prev._3, cur._3)
      }
    }
    assert(checked.nonEmpty, "expected at least one gap day at sf0.001")
    checked.foreach { case (prev, cur) =>
      assert(cur == prev, "gap must carry the previous filled value")
    }
  }
}
