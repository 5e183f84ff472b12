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
}
