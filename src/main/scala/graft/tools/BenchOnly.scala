package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness (not part of the engine surface): graft.Bench for a
  * subset of ops — same session shape, warmup discipline, and
  * best-of-N timing as the driver's bench, limited to the named
  * queries so a single operator can be measured in isolation:
  * `runMain graft.tools.BenchOnly <sfDir> <opName> [...]`.
  */
object BenchOnly {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names @ _*) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    val picked = names.map(n => n -> qs.getOrElse(n, sys.error(s"unknown op $n")))
    val warmDir = {
      val d = "/root/testdata/sf0.001"
      if (new java.io.File(d).isDirectory) d else sfDir
    }
    picked.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    val results = picked.map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    results.foreach { case (n, t) => println(f"[benchonly] $n%-28s $t%8.3f s") }
    spark.stop()
  }
}
