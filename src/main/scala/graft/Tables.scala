package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table catalog over a scale-factor directory (TESTDATA.md).
  *
  * All readers are plain `spark.read.parquet` so Catalyst's vectorized
  * Parquet scan, predicate pushdown, and column pruning apply. At 100 TB
  * the same code path works: Parquet footers give row-group stats, and
  * `spark.sql.files.maxPartitionBytes` controls split granularity — no
  * code change needed between local[32] and a 1000-executor cluster.
  */
object Tables {
  /** Live-database source switch (reference reads live PostgreSQL:
    * scripts/revalue/revalueCollection.mjs:9-16,
    * scripts/pricing/03_build_market_price_daily.js:24-25): when the
    * session conf `graft.jdbc.url` (or env `GRAFT_JDBC_URL`) is set,
    * tables resolve through `spark.read.format("jdbc")` against that URL
    * with `dbtable = <name>`; parquet from the sf dir otherwise. The
    * JDBC reader participates in pushdown like any DataSource — filters
    * and column pruning travel into the generated SQL; partitioned reads
    * (partitionColumn/numPartitions) are the caller's per-table tuning
    * knob at scale. Round-tripped in JdbcSourceSpec against an embedded
    * Derby database.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val url = spark.conf.getOption("graft.jdbc.url")
      .orElse(sys.env.get("GRAFT_JDBC_URL")).getOrElse("")
    if (url.nonEmpty)
      spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", name)
        .load()
    else spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects outright. Read nanos as a plain long and
    * expose a derived µs `ts` (integer `div`, not `/` — epoch nanos
    * exceed double's 53-bit mantissa) plus the raw `ts_ns`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts_ns div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
