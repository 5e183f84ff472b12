package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental maintenance of a materialized aggregate — the missing
  * sibling of the engine's incremental DEDUP (`q_dedup_incremental`:
  * new batch vs standing index) for the aggregation side: a standing
  * per-day aggregate VIEW is refreshed with a delta batch by algebraic
  * merge, never by recomputing the corpus.
  *
  * The reference runs exactly this cadence — its cron re-derives
  * day-valuation aggregates from scratch on every run
  * (scripts/collection/revalueCollection.mjs:105-179 recomputes the
  * day's totals each invocation); at 100 TB a from-scratch GROUP BY
  * over the fact table per refresh is the thing you cannot do. The
  * maintainable form decomposes every surfaced stat into COMMUTATIVE
  * MONOID components (count, sum — merged by addition; avg is DERIVED
  * at read as sum/count, never stored): refresh cost is then
  * O(delta + |view|), independent of corpus size, and the same
  * decomposition is what Spark's own partial aggregation exploits
  * map-side inside one job.
  *
  * Shape: the standing store holds (day, n_orders, sum_cents) for the
  * base slice of `orders`, built once per source-listing signature
  * (fixture-reuse convention of the CSV/ORC ops — building the base is
  * the one-time backfill, not what the refresh measures). The
  * registered op aggregates ONLY the delta slice (o_orderkey % 10 = 0
  * — the arriving batch, same convention as `q_dedup_incremental`),
  * unions it with the store, and re-aggregates per day: sum-of-sums /
  * sum-of-counts, one shuffle over |view| + |delta-days| rows.
  * [[IncrementalAggSpec]] pins merge ≡ full recompute, store reuse
  * across invocations, and that overlap days really carry both sides.
  */
object IncrementalAgg {

  /** Delta membership: the arriving batch. */
  val DeltaMod = 10

  private def cents = round(col("o_totalprice") * 100).cast("long")

  private def dayAgg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"), sum(cents).as("sum_cents"))

  /** The standing base-aggregate store, built once per source
    * signature; returns its scan. */
  def baseStore(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val store = SinkOps.stagingDir(dir, "mv_agg")
    val marker = new org.apache.hadoop.fs.Path(s"$store/_SUCCESS")
    val sigPath = new org.apache.hadoop.fs.Path(s"$store/_SRC_SIG")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val srcSig = graft.sources.RunLog
      .sourceSignature(spark, dir, "orders.parquet") + ":v1"
    val valid = fs.exists(marker) && fs.exists(sigPath) && {
      val in = fs.open(sigPath)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) == srcSig
      finally in.close()
    }
    if (!valid) {
      dayAgg(Tables.orders(spark, dir)
          .filter(col("o_orderkey") % DeltaMod =!= 0))
        .write.mode("overwrite").parquet(store)
      val out = fs.create(sigPath, true)
      try out.write(srcSig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    spark.read.parquet(store)
  }

  /** The refresh kernel: merge a standing (day, n, sum) view with a
    * delta-batch aggregate by monoid addition; avg derived at read. */
  def refresh(
      base: org.apache.spark.sql.DataFrame,
      delta: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    base.union(dayAgg(delta))
      .groupBy(col("day"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("sum_cents")).as("sum_cents"))
      // DIV = exact integral division (the double-path a/b could round
      // the quotient across an integer boundary before the cast)
      .withColumn("avg_cents", expr("sum_cents DIV n_orders"))

  val mvRefresh: Op = Op(
    "q_mv_refresh",
    s"""SELECT CAST(o_orderdate AS DATE) AS day,
       |       COUNT(*) AS n_orders,
       |       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
       |       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
       |            // COUNT(*) AS BIGINT) AS avg_cents
       |FROM orders GROUP BY 1""".stripMargin) { (spark, dir) =>
    refresh(
      baseStore(spark, dir),
      Tables.orders(spark, dir).filter(col("o_orderkey") % DeltaMod === 0))
  }
}
