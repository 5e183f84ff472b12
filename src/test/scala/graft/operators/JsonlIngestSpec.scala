package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JSONL feed ingest: the quarantine must catch exactly the malformed
  * lines (no silent drops, no salvage of partial objects), and the
  * good-side aggregate must reconcile with the source table.
  */
class JsonlIngestSpec extends SparkSpec {

  test("quarantines exactly the malformed lines; good side reconciles") {
    val out = IngestOps.jsonlIngest.build(spark, sf001).collect()
    val docs = graft.Tables.documents(spark, sf001)
    val expectBad = docs
      .filter(col("doc_id") % IngestOps.JsonlCorruptMod === 0).count()
    val bad = out.find(_.getString(0) == "_corrupt")
      .getOrElse(fail("missing _corrupt accounting row"))
    assert(bad.getLong(1) === expectBad, "quarantine count drifted")
    assert(expectBad > 0, "fixture must contain malformed lines")
    val goodRows = out.filter(_.getString(0) != "_corrupt")
    assert(goodRows.map(_.getLong(1)).sum === docs.count() - expectBad,
      "every non-quarantined line must be accounted once")
    // per-lang char sums reconcile against the parquet source — the
    // JSON round trip loses no text
    val expect = docs.filter(col("doc_id") % IngestOps.JsonlCorruptMod =!= 0)
      .groupBy("lang").agg(sum(length(col("text"))).as("chars"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    goodRows.foreach { r =>
      assert(r.getLong(2) === expect(r.getString(0)),
        s"char sum drifted for lang ${r.getString(0)}")
    }
  }
}
