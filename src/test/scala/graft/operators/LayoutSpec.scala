package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: curve correctness (bijection, monotone locality) and
  * the actual data-skipping property — per-FILE min/max envelopes stay
  * narrow on BOTH clustered dimensions at once. File statistics are not
  * SQL-visible, so this spec (not the DuckDB oracle) owns that half of
  * the q_zorder_layout contract. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("z-value interleave is a bijection (decode inverts encode)") {
    val rows = spark.range(0, 1L << 10).selectExpr(
        "id % 32 AS x", "id div 32 AS y")
      .withColumn("z", Layout.zValue(col("x"), col("y")))
      .collect()
    assert(rows.length == 1024)
    rows.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(Layout.zDecode(z, 0) == x && Layout.zDecode(z, 1) == y,
        s"decode($z) != ($x, $y)")
    }
    // distinct z values == distinct (x, y) pairs
    assert(rows.map(_.getLong(2)).distinct.length == 1024)
  }

  test("per-file envelopes are narrow on BOTH dimensions") {
    val out = Layout.layoutDir(spark, sf001)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .map(_.getPath.toString).filter(_.endsWith(".parquet")).toSeq
    assert(files.size > 4, s"expected a multi-file layout, got $files")

    val global = spark.read.parquet(out).agg(
      min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).head()
    val partSpan = (global.getLong(1) - global.getLong(0)).toDouble
    val suppSpan = (global.getLong(3) - global.getLong(2)).toDouble

    val fracs = files.map { f =>
      val st = spark.read.parquet(f).agg(
        min("l_partkey"), max("l_partkey"),
        min("l_suppkey"), max("l_suppkey"),
        min("z"), max("z")).head()
      ((st.getLong(1) - st.getLong(0)) / partSpan,
        (st.getLong(3) - st.getLong(2)) / suppSpan,
        (st.getLong(4), st.getLong(5)))
    }
    // range partitioning on z: file z-ranges must not interleave (allow
    // boundary ties — rows equal to a bound may land on either side)
    val zSorted = fracs.map(_._3).sortBy(_._1)
    zSorted.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) =>
        assert(loB >= hiA - 0, s"z-ranges overlap: $zSorted")
      case _ => ()
    }
    // the locality payoff: on average a file covers well under the full
    // span of EACH dimension (a single-key sort would leave the other
    // dimension's per-file span at ~100%)
    val avgPart = fracs.map(_._1).sum / fracs.size
    val avgSupp = fracs.map(_._2).sum / fracs.size
    assert(avgPart < 0.6, s"avg per-file partkey span fraction $avgPart")
    assert(avgSupp < 0.6, s"avg per-file suppkey span fraction $avgSupp")
  }

  test("compaction plan: greedy day packing — dense buckets, disjoint ordered ranges") {
    // 10 days x 7 rows, target 20: prefix-before 0,7,14,21,...,63
    // -> buckets 0:{d1..d3} 1:{d4..d6} 2:{d7..d9} 3:{d10}
    val inv = (1 to 10).map(d => (d, 7L)).toDF("day", "n_rows")
    val got = Layout.compactionPlanOf(inv, 20L)
      .selectExpr("bucket", "n_parts", "n_rows",
        "CAST(day_min AS INT)", "CAST(day_max AS INT)")
      .as[(Long, Long, Long, Int, Int)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (0L, 3L, 21L, 1, 3), (1L, 3L, 21L, 4, 6),
      (2L, 3L, 21L, 7, 9), (3L, 1L, 7L, 10, 10)))
  }

  test("compaction plan over orders: buckets partition the table, overflow bounded") {
    // sf0.01, not sf0.001: the smaller set fits one bucket, which would
    // make the dense-ids / disjoint-ranges / overflow assertions vacuous
    val sf01 = "/root/testdata/sf0.01"
    val orders = graft.Tables.orders(spark, sf01)
    val plan = Layout.compactionPlan.build(spark, sf01)
      .select($"bucket", $"n_parts", $"n_rows",
        $"day_min".cast("string"), $"day_max".cast("string"))
      .collect().sortBy(_.getLong(0))
    assert(plan.length > 1, "need multi-bucket structure for a real check")
    // dense bucket ids from 0
    assert(plan.map(_.getLong(0)).toSeq == plan.indices.map(_.toLong))
    // every order lands in exactly one bucket
    assert(plan.map(_.getLong(2)).sum == orders.count())
    // day ranges are disjoint and ordered across consecutive buckets
    // (ISO strings compare in day order)
    plan.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getString(4) < b.getString(3),
          s"overlapping day ranges: $a / $b")
      case _ => ()
    }
    // a bucket overflows the target by at most one day's rows
    val maxDay = orders.groupBy($"o_orderdate").count()
      .agg(max($"count")).head().getLong(0)
    plan.foreach { r =>
      assert(r.getLong(2) < Layout.CompactTargetRows + maxDay,
        s"bucket exceeds target+1 day: $r")
    }
  }

  test("layout round-trip preserves every row (count + keyed checksum)") {
    val src = graft.Tables.lineitem(spark, sf001)
    val laid = spark.read.parquet(Layout.layoutDir(spark, sf001))
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)),
        sum(col("l_orderkey") * 7 + col("l_partkey") * 3 + col("l_suppkey")),
        sum(col("l_quantity").cast("long"))).head().toSeq
    assert(sig(laid.drop("z")) == sig(src))
  }
}
