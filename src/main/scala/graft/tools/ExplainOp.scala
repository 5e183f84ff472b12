package graft.tools

/** Print the formatted physical plan of named registered ops (dev
  * tooling for plan audits):
  *
  *   sbt -batch "runMain graft.tools.ExplainOp <sfDir> <op> [op...]"
  */
object ExplainOp {
  def main(args: Array[String]): Unit = {
    val Array(dir, names @ _*) = args
    val spark = graft.Verify.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      println(s"==== $n ====")
      qs.getOrElse(n, sys.error(s"unknown op $n"))(spark, dir)
        .explain("formatted")
    }
    spark.stop()
  }
}
