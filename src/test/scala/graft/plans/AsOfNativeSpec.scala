package graft.plans

import graft.SparkSpec
import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** The native whole-operator as-of join (AsOfJoinPlan → GraftAsOfStrategy
  * → AsOfJoinExec) must: match the carry-forward twin row-for-row on the
  * real corpus, plan as exactly one exchange + sort per side with no
  * window, reuse an existing partitioning with NO added exchange, and
  * honor the contract's edge semantics (null pad, tie-break, null-key
  * grouping) across multiple partitions.
  */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  test("parity: native exec ≡ carry-forward twin at sf0.001") {
    val twin = AsOf.asofJoin.build(spark, sf001).collect().map(_.toString).sorted
    val native = AsOf.asofNative.build(spark, sf001).collect().map(_.toString).sorted
    assert(native.length === twin.length)
    assert(native.sameElements(twin),
      s"first diffs: ${native.diff(twin).take(3).mkString("; ")} | ${twin.diff(native).take(3).mkString("; ")}")
  }

  test("plan: AsOfJoin node, one exchange+sort per side, no window/SMJ") {
    val p = AsOf.asofNative.build(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"native exec missing:\n$p")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"),
      s"native path must not fall back to window/SMJ:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 2, s"expected 2 exchanges (one per side), got $exchanges:\n$p")
  }

  test("pre-partitioned inputs satisfy the distribution — no extra exchange") {
    val probe = Seq((1L, 10, "p1"), (2L, 20, "p2")).toDF("k", "t", "pv")
      .repartition(col("k"))
    val state = Seq((1L, 5, "s1"), (2L, 25, "s2")).toDF("k", "t", "sv")
      .withColumnRenamed("k", "sk").withColumnRenamed("t", "st")
      .repartition(col("sk"))
    val joinedPlan = AsOf.asofJoinNative(probe, state,
      keys = Seq("k" -> "sk"), time = "t" -> "st", tieBreak = Seq("sv"))
      .queryExecution.executedPlan.toString
    val exchanges = joinedPlan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 2,
      s"the repartition exchanges must be REUSED (2 total, 0 added):\n$joinedPlan")
  }

  test("edge semantics: null pad, same-time tie-break, null-key grouping") {
    // probe over 4 partitions; state deliberately shuffled input order
    val probe = Seq[(java.lang.Long, Int, String)](
      (1L, 10, "p-match"),        // state at t=5 and t=10 → tie logic at 10
      (1L, 4, "p-before-all"),    // earliest state is 5 → null
      (2L, 100, "p-no-state"),    // key never in state → null
      (3L, 50, "p-only-future"),  // state only at t=60 → null
      (null, 7, "p-null-key")     // must match the null-key state row
    ).toDF("k", "t", "pv").repartition(4)
    val state = Seq[(java.lang.Long, Int, Long, String)](
      (1L, 10, 7L, "tie-low"),    // same (key,time): greatest tie wins
      (1L, 10, 9L, "tie-high"),
      (1L, 5, 1L, "early"),
      (3L, 60, 2L, "future"),
      (null, 6, 3L, "null-key")
    ).toDF("sk", "st", "tie", "sv").repartition(5)
    val out = AsOf.asofJoinNative(probe, state,
      keys = Seq("k" -> "sk"), time = "t" -> "st", tieBreak = Seq("tie"))
      .select($"pv", $"sv").as[(String, Option[String])].collect().toMap
    assert(out("p-match") === Some("tie-high"))
    assert(out("p-before-all") === None)
    assert(out("p-no-state") === None)
    assert(out("p-only-future") === None)
    assert(out("p-null-key") === Some("null-key"),
      "key equality is grouping equality — same as the window twin's partitionBy")
  }

  test("forward direction: earliest at-or-after, smallest tie, null pad") {
    val probe = Seq[(java.lang.Long, Int, String)](
      (1L, 10, "p-exact"),        // state at exactly 10 (two rows) → tie logic
      (1L, 11, "p-next"),         // next state after 11 is 20
      (1L, 99, "p-after-all"),    // no state at-or-after → null
      (2L, 1, "p-no-state"),      // key never in state → null
      (null, 1, "p-null-key")     // matches the null-key state row
    ).toDF("k", "t", "pv").repartition(4)
    val state = Seq[(java.lang.Long, Int, Long, String)](
      (1L, 10, 7L, "tie-low"),    // same (key,time): SMALLEST tie wins forward
      (1L, 10, 9L, "tie-high"),
      (1L, 20, 1L, "later"),
      (1L, 5, 2L, "earlier"),
      (null, 6, 3L, "null-key")
    ).toDF("sk", "st", "tie", "sv").repartition(5)
    val out = AsOf.asofJoinNative(probe, state,
      keys = Seq("k" -> "sk"), time = "t" -> "st", tieBreak = Seq("tie"),
      forward = true)
      .select($"pv", $"sv").as[(String, Option[String])].collect().toMap
    assert(out("p-exact") === Some("tie-low"))
    assert(out("p-next") === Some("later"))
    assert(out("p-after-all") === None)
    assert(out("p-no-state") === None)
    assert(out("p-null-key") === Some("null-key"))
  }

  test("forward parity vs an aggregate-computed twin on the corpus") {
    val o = graft.Tables.orders(spark, sf001).select(
      $"o_orderkey", to_date($"o_orderdate").as("order_date"))
    val l = graft.Tables.lineitem(spark, sf001).select(
      $"l_orderkey".as("o_orderkey"), to_date($"l_shipdate").as("sd"),
      $"l_linenumber")
    // reference: min (ship date, line number) pair at-or-after per order
    val expect = o.join(l, Seq("o_orderkey"))
      .filter($"sd" >= $"order_date")
      .groupBy($"o_orderkey")
      .agg(min(struct($"sd", $"l_linenumber")).as("m"))
      .select($"o_orderkey", $"m.l_linenumber".as("ln"))
      .as[(Long, Int)].collect().toMap
    val got = AsOf.asofForward.build(spark, sf001)
      .select($"o_orderkey", $"first_line")
      .as[(Long, Option[Int])].collect().toMap
    assert(got.size === o.count())
    assert(expect.nonEmpty, "forward matches must be dense in this domain")
    got.foreach { case (k, ln) => assert(ln === expect.get(k),
      s"forward match drifted for order $k") }
  }

  test("many state rows per key stream through: latest at-or-before wins") {
    val probe = (1 to 50).map(t => (1L, t * 2, s"p$t")).toDF("k", "t", "pv")
    val state = (1 to 200).map(t => (1L, t, t.toLong, s"s$t"))
      .toDF("sk", "st", "tie", "sv").orderBy(rand(7)) // arrival order irrelevant
    val out = AsOf.asofJoinNative(probe, state,
      keys = Seq("k" -> "sk"), time = "t" -> "st", tieBreak = Seq("tie"))
      .select($"pv", $"sv").as[(String, String)].collect().toMap
    (1 to 50).foreach { t => assert(out(s"p$t") === s"s${t * 2}") }
  }
}
