package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness (not part of the engine surface): time individual
  * registered ops by name under the driver's bench config —
  * `runMain graft.tools.TimeOp <sfDir> <opName> [<opName> ...]`.
  * One untimed warmup at sf0.001 (codegen/JIT), then 3 timed runs.
  */
object TimeOp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      val fn = qs.getOrElse(n, sys.error(s"unknown op $n"))
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeop] $n%-24s min ${times.min}%6.2f s   runs ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
