package graft.operators

import graft.sources.{TxCommit, TxStore}

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Exactly-once streaming commits through the manifest store: a
  * replayed micro-batch must no-op, a zombie racing a live committer
  * must lose harmlessly, and the registered op must be idempotent
  * across re-invocations.
  */
class StreamTxSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType.fromDDL("k STRING, v BIGINT")

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft-streamtx").toString

  test("replayed batchId no-ops; store holds each delta exactly once") {
    val root = freshRoot()
    val b0 = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val b1 = Seq(("a", 10L)).toDF("k", "v")
    assert(TxStore.commitStreamBatch(spark, root, 0L, "rollup", b0))
    assert(TxStore.commitStreamBatch(spark, root, 1L, "rollup", b1))
    // crash-replay: same batchId, possibly different row order/content —
    // the acknowledgment is the manifest, so this must change NOTHING
    assert(!TxStore.commitStreamBatch(spark, root, 1L, "rollup",
      Seq(("poison", 999L)).toDF("k", "v")))
    val got = TxCommit.readAll(spark, root, "rollup", schema)
      .as[(String, Long)].collect().sorted
    assert(got === Array(("a", 1L), ("a", 10L), ("b", 2L)))
  }

  test("zombie racing the same version loses; winner's data survives") {
    val root = freshRoot()
    assert(TxStore.commitStreamBatch(spark, root, 0L, "rollup",
      Seq(("live", 1L)).toDF("k", "v")))
    // a zombie executor that staged BEFORE the live committer's commit
    // landed: its manifest rename-if-absent must fail and its staging
    // dir must never be referenced
    val zombie = TxCommit.Txn(root, 1L, "zombiezombie")
    Seq(("zombie", 666L)).toDF("k", "v")
      .write.parquet(zombie.stage("rollup"))
    assert(!TxCommit.commit(spark, zombie, Map("rollup" -> zombie.stage("rollup"))))
    val got = TxCommit.readAll(spark, root, "rollup", schema)
      .as[(String, Long)].collect()
    assert(got === Array(("live", 1L)))
  }

  test("compaction preserves the union and bounds the dir count") {
    val root = freshRoot()
    import spark.implicits._
    (0L to 3L).foreach { b =>
      assert(TxStore.commitStreamBatch(spark, root, b, "rollup",
        Seq((s"k$b", b)).toDF("k", "v")))
    }
    assert(TxCommit.streamDataPaths(spark, root, "rollup").size === 4)
    val before = TxCommit.readAll(spark, root, "rollup", schema)
      .as[(String, Long)].collect().sorted
    assert(TxCommit.compactStream(spark, root, "rollup", schema))
    // nothing new to cover → second compaction refuses
    assert(!TxCommit.compactStream(spark, root, "rollup", schema))
    assert(TxCommit.streamDataPaths(spark, root, "rollup").size === 1)
    val after = TxCommit.readAll(spark, root, "rollup", schema)
      .as[(String, Long)].collect().sorted
    assert(after === before, "compaction must not change the union")
    // a post-compaction batch reads as compaction + one suffix dir
    assert(TxStore.commitStreamBatch(spark, root, 4L, "rollup",
      Seq(("k4", 4L)).toDF("k", "v")))
    assert(TxCommit.streamDataPaths(spark, root, "rollup").size === 2)
    assert(TxCommit.readAll(spark, root, "rollup", schema)
      .as[(String, Long)].collect().sorted === (before :+ (("k4", 4L))).sorted)
    // …and a second compaction folds the suffix in
    assert(TxCommit.compactStream(spark, root, "rollup", schema))
    TxCommit.vacuumStream(spark, root, "rollup")
    assert(TxCommit.streamDataPaths(spark, root, "rollup").size === 1)
    assert(TxCommit.readAll(spark, root, "rollup", schema)
      .as[(String, Long)].collect().sorted === (before :+ (("k4", 4L))).sorted)
  }

  test("replay after compaction + vacuum still no-ops; orphans removed") {
    val root = freshRoot()
    import spark.implicits._
    (0L to 2L).foreach { b =>
      assert(TxStore.commitStreamBatch(spark, root, b, "rollup",
        Seq((s"k$b", b)).toDF("k", "v")))
    }
    assert(TxCommit.compactStream(spark, root, "rollup", schema))
    // a crashed compactor's unpublished data dir
    val orphan = new java.io.File(s"$root/_compactdata/rollup-v99999999-dead")
    orphan.mkdirs()
    TxCommit.vacuumStream(spark, root, "rollup")
    assert(!orphan.exists, "orphaned compact dir must be vacuumed")
    // batch manifests survived vacuum → replays still acknowledge
    (0L to 2L).foreach { b =>
      assert(!TxStore.commitStreamBatch(spark, root, b, "rollup",
        Seq(("poison", 999L)).toDF("k", "v")),
        s"replayed batch $b must no-op after compaction + vacuum")
    }
    assert(TxCommit.readAll(spark, root, "rollup", schema)
      .as[(String, Long)].collect().sorted ===
      Array(("k0", 0L), ("k1", 1L), ("k2", 2L)))
  }

  test("registered op: store ≡ batch rollup, and re-invocation no-ops") {
    val expected = graft.Tables.events(spark, sf001)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .collect().map(_.toString).sorted
    val first = StreamingOps.streamTx
      .build(spark, sf001).collect().map(_.toString).sorted
    assert(first.sameElements(expected))
    val root = SinkOps.stagingDir(sf001, "stream_tx")
    val versionsBefore = TxCommit.versions(spark, root)
    // second invocation replays the source from batch 0 with a fresh
    // checkpoint; every commit must skip against the standing manifests
    val second = StreamingOps.streamTx
      .build(spark, sf001).collect().map(_.toString).sorted
    assert(second.sameElements(expected))
    assert(TxCommit.versions(spark, root) === versionsBefore,
      "re-invocation must not append new versions")
  }
}
