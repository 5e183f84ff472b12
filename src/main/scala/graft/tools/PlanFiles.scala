package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev tool: write `explain("formatted")` for named queries into
  * per-query files — the round deliverable convention
  * (plans/rNN/<query>_<suffix>.txt).
  *
  *   sbt -batch "runMain graft.tools.PlanFiles <sfDir> <outDir> <suffix> <op> [op...]"
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val Array(dir, outDir, suffix, names @ _*) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      try {
        val df = qs.getOrElse(n, sys.error(s"unknown op $n"))(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${n}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[planfiles] wrote $n ($suffix, ${plan.length} chars)")
      } catch { case e: Throwable =>
        println(s"[planfiles] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
