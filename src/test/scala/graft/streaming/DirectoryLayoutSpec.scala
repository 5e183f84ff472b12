package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Table-LAYOUT parity for the streaming sources (r13 decade-soak
  * catch): the driver corpus stores table t as a single FILE
  * `dir/t.parquet`, but any Spark-written corpus — and every real
  * deployment — stores it as a DIRECTORY of part files. The streaming
  * sources used to glob-filter the parent dir by leaf name, which
  * matches NOTHING under the directory layout: every streaming op
  * silently read an EMPTY stream (zero rows, no error) on the sf1
  * twin. This spec pins the fix structurally: a directory-layout twin
  * of sf0.001 must produce byte-identical streaming results to the
  * single-file layout, and the staleness signature of a directory
  * table must be non-empty (an empty signature can never detect a
  * stale store).
  */
class DirectoryLayoutSpec extends SparkSpec {

  /** sf0.001 rewritten with every table as a part-file DIRECTORY. */
  private lazy val dirTwin: String = {
    val out = "/tmp/graft_dirlayout_twin"
    val f = new java.io.File(out)
    def rm(x: java.io.File): Unit = {
      val cs = x.listFiles(); if (cs != null) cs.foreach(rm)
      x.delete(): Unit
    }
    rm(f)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      spark.read.parquet(s"$sf001/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    out
  }

  private def rows(name: String, dir: String): Seq[String] = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect().map(_.toString).sorted.toSeq
  }

  test("streaming ops read directory-layout tables: q_stream_dedup and " +
    "q_stream_tumbling equal their single-file results row for row") {
    for (op <- Seq("q_stream_dedup", "q_stream_tumbling")) {
      val single = rows(op, sf001)
      val dirRes = rows(op, dirTwin)
      assert(dirRes.nonEmpty, s"$op: empty result on directory layout")
      assert(dirRes === single,
        s"$op: directory-layout result diverges from single-file layout")
    }
  }

  test("documents-backed streaming op reads the directory layout " +
    "(q_stream_quality non-empty and layout-equal)") {
    val single = rows("q_stream_quality", sf001)
    val dirRes = rows("q_stream_quality", dirTwin)
    assert(dirRes.nonEmpty)
    assert(dirRes === single)
  }

  test("sourceSignature of a directory table signs its data files " +
    "(non-empty, marker files excluded, and sensitive to content size)") {
    val sig = graft.sources.RunLog.sourceSignature(
      spark, dirTwin, "events.parquet")
    assert(sig.nonEmpty, "directory table must not sign as empty")
    assert(!sig.contains("_SUCCESS"), "marker files must stay out")
    // same listing signs identically; the single-file layout signs
    // differently (different file names/sizes) — the signature really
    // reflects the files backing the table
    assert(sig === graft.sources.RunLog.sourceSignature(
      spark, dirTwin, "events.parquet"))
    assert(sig !== graft.sources.RunLog.sourceSignature(
      spark, sf001, "events.parquet"))
  }

  test("sourceSignature of a PARTITIONED table (key=value " +
    "subdirectories — only directory children at depth 1) signs its " +
    "leaf data files, not empty (ADVICE r14)") {
    val out = "/tmp/graft_dirlayout_partitioned"
    def rm(x: java.io.File): Unit = {
      val cs = x.listFiles(); if (cs != null) cs.foreach(rm)
      x.delete(): Unit
    }
    rm(new java.io.File(out))
    spark.read.parquet(s"$sf001/events.parquet")
      .withColumn("etype_part", col("event_type"))
      .write.partitionBy("etype_part")
      .parquet(s"$out/events.parquet")
    val sig = graft.sources.RunLog.sourceSignature(
      spark, out, "events.parquet")
    assert(sig.nonEmpty,
      "partitioned directory table must not sign as empty")
    assert(!sig.contains("_SUCCESS"), "marker files must stay out")
    // entries carry partition-relative paths, so identically named
    // part files in different partitions stay distinct
    assert(sig.contains("etype_part="))
    // deterministic for an unchanged listing; sensitive to a new file
    assert(sig === graft.sources.RunLog.sourceSignature(
      spark, out, "events.parquet"))
    val extra = new java.io.FileOutputStream(
      s"$out/events.parquet/etc.parquet")
    try extra.write("x".getBytes("UTF-8")) finally extra.close()
    assert(sig !== graft.sources.RunLog.sourceSignature(
      spark, out, "events.parquet"))
  }

  test("best-of-day GLOB source over DIRECTORY-layout snap tables " +
    "streams increments (ADVICE r14: the wildcard fallthrough used to " +
    "bootstrap fine and then silently never stream a late directory)") {
    val src = "/tmp/graft_bod_dirglob_src"
    val base = "/tmp/graft_bod_dirglob_base"
    val hot = "/tmp/graft_bod_dirglob_hot"
    for (p <- Seq(src, base, s"$base.meta", hot, s"$hot.checkpoint"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
    val li = spark.read.parquet(s"$sf001/lineitem.parquet").cache()
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val maxDay = graft.operators.Pricing.snapsOf(li)
      .agg(max(col("as_of_date"))).head().getDate(0)
    val lateFrom = java.sql.Date.valueOf(maxDay.toLocalDate.minusDays(60))
    val b = li.filter(col("l_orderkey") % 2 === 1 &&
      to_date(col("l_shipdate")) >= lit(lateFrom))
    // each snap drop is a Spark-written DIRECTORY matched by the glob
    a.write.mode("overwrite").parquet(s"$src/snap_a.parquet")
    graft.streaming.EventStream.runBestOfDayIncremental(
      spark, src, "snap_*.parquet", base, hot)
    // the late drop: a NEW directory the checkpointed stream must see
    b.write.mode("overwrite").parquet(s"$src/snap_b.parquet")
    graft.streaming.EventStream.runBestOfDayIncremental(
      spark, src, "snap_*.parquet", base, hot)
    val want = graft.operators.Pricing.bestReduce(
      graft.operators.Pricing.snapsOf(a.unionByName(b)))
      .select(col("market_item_id"), col("as_of_date").cast("date"),
        col("source"), col("price_type"), col("value_cents"))
    val got = graft.streaming.EventStream.readBestOfDayStore(
      spark, base, hot)
      .select(col("market_item_id"), col("as_of_date").cast("date"),
        col("source"), col("price_type"), col("value_cents"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    li.unpersist()
  }
}
