package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the simhash candidate-join physical plan. */
object ExplainSimhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.operators.Dedup.simhashCandidates(spark, dir).explain("formatted")
  }
}
