package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: run the registered CC consumers once and print how many
  * propagation rounds each [[graft.operators.GraphOps
  * .connectedComponents]] invocation took.
  *
  *   sbt -batch "runMain graft.tools.CcRounds <sfDir> <op> [op...]"
  */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val Array(dir, names @ _*) = args
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
      graft.operators.GraphOps.lastCcRounds = -1
      val t0 = System.nanoTime()
      qs(n)(spark, dir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ccrounds] $n%-24s ${s}%7.3f s  lastCcRounds=" +
        s"${graft.operators.GraphOps.lastCcRounds}")
    }
    spark.stop()
  }
}
