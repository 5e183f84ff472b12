package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness (not part of the engine surface): generate the
  * WHOLE-REGISTRY decade-soak corpus (r12 verdict #1) — an sf1-shaped
  * twin of the driver's sf0.1 testdata, so the families that never had
  * a measured 10× step (windows, joins, graph, SCD2, sinks/tx,
  * streaming-state) get one.
  *
  * Relational tables scale by REPLICATION with FK-consistent key
  * shifts: copy k adds `k · stride(table)` to every key column, where
  * the stride is that key's `max+1` in the source — so lineitem rows
  * keep joining their own copy's orders/part/supplier rows, per-key
  * densities and date/value distributions are preserved exactly, and
  * total volume is 10× (the TPC-H scaling law: dimension AND fact
  * tables grow linearly; nation/region stay fixed). Each copy is an
  * independent component, which is precisely what a linearity probe
  * wants: an expected-linear op must cost 10×, never 100×.
  *
  * documents/embeddings are NOT replicated — identical replicated
  * texts would plant C(copies,2) artificial cross-copy near-dup pairs
  * per doc and poison the dedup/vector exponents (those families have
  * their own measured soaks, PERF.md rounds 7/11). They come from
  * [[GenSoakCorpus]]'s generator (same measured structure as the
  * driver corpus, `entities` long tail on) at 10× the sf0.1 counts:
  * 50k docs / 20k vectors.
  *
  * `runMain graft.tools.GenScaleTwin [<srcDir> <outDir> [copies]]`
  */
object GenScaleTwin {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // key strides = max+1 per source key space (not row count: ids may
    // be sparse), so shifted copies can never collide
    def stride(t: String, c: String): Long =
      read(t).agg(max(col(c))).head().getLong(0) + 1
    val pS = stride("part", "p_partkey")
    val sS = stride("supplier", "s_suppkey")
    val cS = stride("customer", "c_custkey")
    val oS = stride("orders", "o_orderkey")
    val eS = stride("events", "event_id")
    val uS = stride("events", "user_id")

    /** One scan, `copies` shifted images: broadcast-crossJoin the tiny
      * copy index and add k·stride to each key column. */
    def repl(df: DataFrame, shifts: (String, Long)*): DataFrame = {
      val ks = broadcast(spark.range(copies).select(col("id").as("_k")))
      val shifted = shifts.foldLeft(df.crossJoin(ks)) {
        case (d, (c, s)) => d.withColumn(c, col(c) + col("_k") * s)
      }
      shifted.select(df.columns.map(col).toIndexedSeq: _*)
    }

    write(repl(read("part"), "p_partkey" -> pS), "part")
    write(repl(read("supplier"), "s_suppkey" -> sS), "supplier")
    write(repl(read("customer"), "c_custkey" -> cS), "customer")
    write(repl(read("orders"), "o_orderkey" -> oS, "o_custkey" -> cS),
      "orders")
    write(repl(read("lineitem"), "l_orderkey" -> oS, "l_partkey" -> pS,
      "l_suppkey" -> sS), "lineitem")
    write(repl(read("events"), "event_id" -> eS, "user_id" -> uS),
      "events")
    // fixed dimensions: TPC-H keeps nation/region constant across SF
    write(read("nation"), "nation")
    write(read("region"), "region")
    spark.stop()

    // fresh text/vector corpora at `copies`× the sf0.1 counts (5k docs
    // / 2k vectors per copy — GenSoakCorpus owns its own session; it
    // also emits a part.parquet we discard). Scaling with `copies`
    // keeps the twin self-consistent at the 100× third-decade step.
    val tmp = s"$out-textgen"
    GenSoakCorpus.main(Array(tmp, (5000 * copies).toString, "1000",
      (2000 * copies).toString, "entities"))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    for (t <- Seq("documents", "embeddings")) {
      val dst = new org.apache.hadoop.fs.Path(s"$out/$t.parquet")
      fs.delete(dst, true)
      fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/$t.parquet"), dst)
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    println(s"[scale-twin] wrote ${copies}x twin of $src at $out")
  }
}
