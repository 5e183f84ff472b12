package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The at-rest half of every shared index ([[PersistedStore]]): a
  * cache-evicted rerun must READ the persisted parquet back — same
  * rows, store files untouched — and a dropped store must rebuild to
  * identical content. One test per round-7 store; the PQ index, phash,
  * and standing-label stores carry the same checks in their own
  * suites. */
class PersistedStoreSpec extends SparkSpec {

  private def storeListing(store: String, sub: String) = {
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$store/$sub"))
      .map(s => s.getPath.getName -> s.getModificationTime).sortBy(_._1).toSeq
  }

  private def checkStore(tag: String, sub: String, evict: () => Unit)(
      frame: => DataFrame): Unit = {
    def rows() = frame.collect().map(_.toString).sorted
    val first = rows()
    assert(first.nonEmpty, s"$tag store produced no rows")
    val store = SinkOps.stagingDir(sf001, tag)
    val before = storeListing(store, sub)
    evict()
    assert(rows() === first, s"$tag: evicted reread diverged")
    assert(storeListing(store, sub) === before,
      s"$tag: cache-evicted rerun must reuse the store, not rewrite it")
    PersistedStore.drop(spark, sf001, tag)
    evict()
    assert(rows() === first, s"$tag: rebuilt store diverged")
  }

  test("lsh pair index persists and rebuilds identically") {
    checkStore("lsh_pair_index", "pairs", () => Dedup.clearLshPairCache())(
      Dedup.minhashLsh.build(spark, sf001))
  }

  test("tf index persists and rebuilds identically") {
    checkStore("tf_index", "tf", () => TextOps.clearTfIndexCache())(
      TextOps.tfIndex(spark, sf001))
  }

  test("co-purchase edges persist and rebuild identically") {
    checkStore("copurchase_edges", "edges",
      () => GraphOps.copurchaseCacheClear())(
      GraphOps.copurchaseEdges(spark, sf001))
  }

  test("graph canopy persists and rebuilds identically") {
    checkStore("graph_canopy", "cells",
      () => Similarity.clearGraphCanopyCache())(
      Similarity.graphCanopy(spark, sf001))
  }

  test("sparse entity labels persist and rebuild identically") {
    checkStore("sparse_entity_labels", "labels",
      () => Dedup.clearSparseEntityCache())(
      Dedup.entityResolve.build(spark, sf001))
  }

  test("drift model persists and rebuilds identically") {
    checkStore("drift_model", "model",
      () => StreamingOps.clearDriftModelCache())(
      StreamingOps.standingDriftModel(spark, sf001))
  }

  test("bpe merge table persists and rebuilds identically") {
    checkStore("bpe_merges", "merges", () => Bpe.clearMergesCache())(
      Bpe.standingMerges(spark, sf001))
  }

  test("bpe segmented vocab persists and rebuilds identically") {
    checkStore("bpe_merges", "vocab", () => Bpe.clearMergesCache())(
      Bpe.standingVocab(spark, sf001))
  }

  test("concurrent ensure on one store builds exactly once") {
    import java.util.concurrent.atomic.AtomicInteger
    val builds = new AtomicInteger(0)
    PersistedStore.drop(spark, sf001, "race_probe")
    val latch = new java.util.concurrent.CountDownLatch(1)
    def run(): String = {
      latch.await()
      PersistedStore.ensure(spark, sf001, "documents.parquet",
        "race_probe", "v1") { root =>
        builds.incrementAndGet()
        Thread.sleep(150) // widen the race window
        graft.Tables.documents(spark, sf001).limit(3)
          .write.mode("overwrite").parquet(s"$root/rows")
      }
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 4).map(_ => pool.submit(
        new java.util.concurrent.Callable[String] { def call(): String = run() }))
      latch.countDown()
      val stores = futures.map(_.get()).toSet
      assert(stores.size === 1)
      assert(builds.get() === 1,
        s"racing callers built ${builds.get()} times; the store lock must " +
          "serialize to exactly one build")
    } finally {
      pool.shutdown()
      PersistedStore.drop(spark, sf001, "race_probe")
    }
  }
}
