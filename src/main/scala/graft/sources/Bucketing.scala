package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (hash-clustered) tables: the planned shuffle-elimination
  * path for repeated big-big joins — the 100 TB complement to
  * broadcasting small dimensions.
  *
  * Writing both sides bucketed AND sorted by the join key into the
  * catalog lets Catalyst prove each side's output partitioning already
  * satisfies the join's distribution requirement: the sort-merge join
  * plans with ZERO Exchange nodes (asserted in BucketingSpec). At 100 TB
  * this converts every recurring fact⋈fact join on the same key from a
  * full two-sided shuffle (the single most expensive movement in the
  * pipeline) into a per-bucket streamed merge; the one-time bucketing
  * cost amortizes across every downstream consumer.
  *
  * The reference has no equivalent (PostgreSQL heap tables re-hash on
  * every join); this is engine-level capability, not parity.
  */
object Bucketing {

  /** Write `df` as a managed parquet table hash-clustered into
    * `buckets` files per partition by `key`, sorted within buckets —
    * the layout both bucket pruning and shuffle-free joins need.
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** [[writeBucketed]] over a COMPOSITE key — hash-clustered and sorted
    * by all of `keys` (e.g. the (band, bucket) MinHash index layout). */
  def writeBucketedKeys(
      df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys. Equality of
    * bucket counts is the caller's contract — mismatched counts silently
    * fall back to a shuffled join (Spark re-partitions the smaller). */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String, leftKey: String,
      rightTable: String, rightKey: String): DataFrame = {
    // resolve each key against its own side: unqualified col(...) would
    // be AMBIGUOUS_REFERENCE whenever both tables share the key column
    // name — the typical co-located join
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    // merge hint: a co-located join exists to stream same-bucket files
    // through a sort-merge — without it a small side under the broadcast
    // threshold would plan as BHJ and silently waste the layout
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
