package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: measure the two compaction paths — merge-by-assignment
  * vs full retrain-on-union — for the PERF retrain-threshold note. */
object ImiCompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Imi
    // warm the standing index store (amortized at rest in production)
    Imi.standingIndex(spark, dir)._2.count()
    def time(label: String, frac: Double): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Imi.compactUnion(spark, dir, frac).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[compact] $label%-22s best ${ts.min}%.2f s (runs: " +
        ts.map(t => f"$t%.2f").mkString(", ") + ")")
    }
    time("merge-by-assignment", 0.25)
    time("full retrain-on-union", 0.0)
    spark.stop()
  }
}
