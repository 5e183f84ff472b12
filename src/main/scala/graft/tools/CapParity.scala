package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Dev measurement: does the bucket-capped hybrid simhash candidate
  * stage lose any VERIFIED pair vs the uncapped hybrid at a given
  * corpus? (Both stages end in exact-Jaccard verification, so set
  * equality of outputs proves the cap dropped no true pair.)
  *
  * `runMain graft.tools.CapParity [<sfDir>]`
  */
object CapParity {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_soak_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val capped = Dedup.simhash.build(spark, dir)
      .select("doc_id_a", "doc_id_b")
    val uncapped = graft.operators.Dedup
      .simhashHybridUncapped(spark, dir)
      .select("doc_id_a", "doc_id_b")
    val onlyUncapped = uncapped.exceptAll(capped).count()
    val onlyCapped = capped.exceptAll(uncapped).count()
    println(s"[capparity] $dir capped=${capped.count()} " +
      s"uncapped=${uncapped.count()} lostByCap=$onlyUncapped " +
      s"extraByCap=$onlyCapped")
    spark.stop()
  }
}
