package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time q_simhash (and stages) in isolation, repeated, to
  * separate codegen-compile cost from steady-state execution. */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // warmup something unrelated
    time("warmup q1_agg")(graft.SparkEntry.queries("q1_agg")(spark, dir).count())
    (1 to 3).foreach { i =>
      time(s"q_simhash run $i")(
        graft.SparkEntry.queries("q_simhash")(spark, dir).count())
    }
    (1 to 2).foreach { i =>
      time(s"q_minhash_lsh run $i")(
        graft.SparkEntry.queries("q_minhash_lsh")(spark, dir).count())
    }
    spark.stop()
  }
}
