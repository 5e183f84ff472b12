package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev profiling harness (not engine surface): per-JOB wall durations
  * for one or more ops under the bench session shape — names which of
  * a query's driver round-trips actually cost time (the successor to
  * [[ProfileJobs]]' aggregate counts).
  *
  *   sbt -batch "runMain graft.tools.ProfileJobDetail <sfDir> <op> [op...]"
  */
object ProfileJobDetail {
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, desc) =>
          val ms = (System.nanoTime() - t0) / 1e6
          lines.add(f"[jobdetail]   job=${e.jobId}%-4d ${ms}%8.1f ms  $desc")
        }
      }
    })
    val qs = graft.SparkEntry.queries
    val warmDir = {
      val d = "/root/testdata/sf0.001"
      if (new java.io.File(d).isDirectory) d else dir
    }
    names.foreach { n =>
      try qs(n)(spark, warmDir).count() catch { case _: Throwable => () }
    }
    names.foreach { n =>
      // one throwaway warm pass at the target dir, then the detailed one
      try qs(n)(spark, dir).count() catch { case e: Throwable =>
        println(s"[jobdetail] $n warm FAILED: ${e.getMessage}") }
      Thread.sleep(300)
      lines.clear()
      val t0 = System.nanoTime()
      try qs(n)(spark, dir).count() catch { case _: Throwable => () }
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[jobdetail] === $n total=${total}%.3f s, ${lines.size} jobs ===")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
