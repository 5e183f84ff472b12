package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev profiling harness (not part of the engine surface): per-query
  * Spark JOB/STAGE/TASK counts under the bench session shape. At bench
  * scale (tiny SFs) a query's wall time is dominated by how many jobs
  * and stages it launches — each job is a driver round-trip, each stage
  * a task-scheduling wave — so this locates fixed-overhead hot spots
  * (extra actions, un-reused exchanges, store signature probes) that a
  * data-path profile can't see.
  *
  *   sbt -batch "runMain graft.tools.ProfileJobs <sfDir> <op> [op...]"
  */
object ProfileJobs {
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
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val qs = graft.SparkEntry.queries
    val warmDir = {
      val d = "/root/testdata/sf0.001"
      if (new java.io.File(d).isDirectory) d else dir
    }
    val picked =
      if (names == Seq("ALL")) qs.keys.toSeq.sorted
      else names
    picked.foreach { n =>
      val fn = qs.getOrElse(n, sys.error(s"unknown op $n"))
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    println("[profilejobs] name, best_s, run2_s, jobs, stages, tasks (per single run)")
    picked.foreach { n =>
      val fn = qs(n)
      // one throwaway timed pass then a counted pass: both warm
      val t0 = System.nanoTime()
      try fn(spark, dir).count() catch { case e: Throwable =>
        println(s"[profilejobs] $n FAILED: ${e.getMessage}") }
      val tA = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      jobs = 0; stages = 0; tasks = 0
      val t1 = System.nanoTime()
      try fn(spark, dir).count() catch { case _: Throwable => () }
      val tB = (System.nanoTime() - t1) / 1e9
      Thread.sleep(300)
      println(f"[profilejobs] $n%-28s ${math.min(tA, tB)}%7.3f $tB%7.3f   j=$jobs%-4d st=$stages%-5d tk=$tasks%-6d")
    }
    spark.stop()
  }
}
