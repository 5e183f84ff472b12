package graft.operators

import org.apache.spark.sql.SparkSession

/** The at-rest half of the shared-index architecture (the FAISS
  * write_index/read_index split, generalized from
  * [[Similarity.pqTrainedIndex]]'s inline form): an engine-built
  * artifact lands as parquet under a staging store guarded by the
  * SOURCE-LISTING SIGNATURE of the corpus files it derives from, so a
  * NEW session — or another process entirely — reads the artifact back
  * instead of rebuilding. Session caches ([[SessionCache.Cache]])
  * memoize the store's scan frames; this object owns the durable copy.
  *
  * At 100 TB this is the production contract for every expensive index
  * (LSH pair graphs, postings, canopy assignments, co-purchase edges,
  * cluster labels): build once next to the corpus, re-read everywhere,
  * invalidate exactly when the corpus files change. The signature is
  * (name|length|mtime) over the source glob plus a version tag, the
  * same guard the transactional sinks and the PQ store already carry —
  * a regenerated fixture rebuilds, a live store never does.
  */
private[graft] object PersistedStore {

  private val storeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]

  /** Build-or-reuse the store for (`dir`, `tag`): when the recorded
    * signature matches the current source listing the store is served
    * as-is; otherwise `write(storeRoot)` rebuilds it (writing any
    * number of parquet dirs under the root) and the new signature is
    * committed LAST — a crash mid-rebuild leaves a stale/absent
    * signature, never a valid-looking half-written store. Returns the
    * store root path.
    *
    * Concurrency: a per-store JVM lock serializes rebuilds across
    * SESSIONS in one process (the session caches' per-scope locks
    * don't cover two sessions sharing a dir). Cross-PROCESS, the
    * signature-last protocol bounds the damage: builds are
    * deterministic per signature, so racing writers produce identical
    * content and the loser's overwrite is content-idempotent; a
    * reader can only observe a store whose writer finished its data
    * pass before committing the signature. */
  def ensure(spark: SparkSession, dir: String, sourceGlob: String,
      tag: String, version: String)(write: String => Unit): String = {
    val store = SinkOps.stagingDir(dir, tag)
    val sigPath = new org.apache.hadoop.fs.Path(s"$store/_SRC_SIG")
    val fs = sigPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcSig =
      graft.sources.RunLog.sourceSignature(spark, dir, sourceGlob) +
        s":$version"
    def valid = fs.exists(sigPath) && {
      val in = fs.open(sigPath)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) == srcSig
      finally in.close()
    }
    if (!valid) {
      val lock = storeLocks.computeIfAbsent(store, _ => new Object)
      lock.synchronized {
        if (!valid) { // re-check under the lock: the race's loser reuses
          write(store)
          val out = fs.create(sigPath, true)
          try out.write(
            srcSig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        }
      }
    }
    store
  }

  /** Test hook: drop a store so the next access rebuilds. */
  private[graft] def drop(spark: SparkSession, dir: String, tag: String): Unit =
    SinkOps.deleteDir(spark, SinkOps.stagingDir(dir, tag))
}
