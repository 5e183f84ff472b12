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
}
