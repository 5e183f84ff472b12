package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler (r14): stage decomposition for q_span_dedup and
  * q_anti_join under the bench session shape — locates whether the
  * cost is window/text construction, the distinct-aggregate expand,
  * the checkpoint materialization, or the join. */
object ProfileMisc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[misc] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.operators.{Spans, Normalize}
    // warmup — fixture pass only when the standard fixture exists
    // (r15 ADVICE: the hardcoded path crashed on machines without it)
    val fixture = "/root/testdata/sf0.001"
    if (new java.io.File(fixture).isDirectory) {
      Spans.spanDedup.build(spark, fixture).count()
      Normalize.antiJoin.build(spark, fixture).count()
    }
    Spans.spanDedup.build(spark, dir).count()
    Normalize.antiJoin.build(spark, dir).count()

    // --- span dedup ---
    val win = Spans.windowRows(spark, dir)
    println(s"[misc] window rows = ${win.count()}")
    timed("windowRows construction (noop)")(
      win.write.format("noop").mode("overwrite").save())
    timed("group win_text count(*) only")(
      win.groupBy(col("win_text")).agg(count(lit(1)).as("nocc"))
        .filter(col("nocc") >= 2).count())
    for (r <- 1 to 2)
      timed(s"full q_span_dedup r$r")(
        Spans.spanDedup.build(spark, dir).count())

    // --- anti join ---
    val li = graft.Tables.lineitem(spark, dir)
    val cutoff = lit("1999-01-01").cast("timestamp")
    val keyedNoCp = li.filter(col("l_shipdate").isNotNull)
      .groupBy(col("l_partkey"), col("l_suppkey"),
        nullif(col("l_returnflag"), lit("N")).as("cond"))
      .agg(
        max(when(col("l_shipdate") < cutoff, 1).otherwise(0)).as("has_old"),
        max(when(col("l_shipdate") >= cutoff, 1).otherwise(0)).as("has_new"))
    println(s"[misc] keyed groups = ${keyedNoCp.count()}")
    timed("keyed aggregate (noop, no checkpoint)")(
      keyedNoCp.write.format("noop").mode("overwrite").save())
    timed("keyed aggregate + localCheckpoint") {
      val cp = keyedNoCp.localCheckpoint()
      cp.unpersist(blocking = false)
    }
    timed("flag filter only (no join)")(
      keyedNoCp.filter(col("has_new") === 1 && col("has_old") === 0).count())
    for (r <- 1 to 2)
      timed(s"full q_anti_join r$r")(
        Normalize.antiJoin.build(spark, dir).count())
    spark.stop()
  }
}
