package graft

import org.apache.spark.sql.SparkSession

/** Session knobs the engine's kernels are designed against — one
  * definition shared by every session recipe (Verify, Bench, the dev
  * tools, the test session) so a production deployment copies ONE
  * block instead of re-deriving it from PERF.md.
  */
object EngineConf {

  /** `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`.
    *
    * The bounded-heap aggregates (`graft_topk` — the IMI argmax /
    * top-nprobe kernels, the per-group top-k family) run as
    * ObjectHashAggregate. At Spark's DEFAULT threshold (128 keys per
    * partition) the operator abandons hashing and falls back to
    * sort-based aggregation as soon as a partition holds more groups
    * than that — which re-sorts the ENTIRE scored input stream, the
    * exact failure the 10M-vector soak caught (a partition holding
    * ~300k (vec, half) groups degraded to a SortAggregate-shaped spill;
    * PERF.md round-11 soak notes). 2M keys of skinny heap buffers
    * (each O(k) longs) is tens of MB per partition — far inside
    * executor memory at the documented session shapes, and the soak
    * ran the full 10M-vector decade under this exact value. A cluster
    * deployment either sets this or buckets the index so per-partition
    * group counts stay bounded.
    */
  val ObjectHashFallbackThreshold = 2000000

  /** Apply the engine's session knobs to a builder. */
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      ObjectHashFallbackThreshold.toString)
}
