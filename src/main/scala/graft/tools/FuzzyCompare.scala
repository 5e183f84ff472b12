package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: time the fuzzy-match join with and without the native
  * bag-distance cut in ONE session (same JIT, same caches) so the cut's
  * effect is isolated from host noise:
  * `runMain graft.tools.FuzzyCompare <sfDir>`.
  */
object FuzzyCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = graft.operators.Dedup.FuzzyMaxDist
    def noBag(dir: String): DataFrame = {
      val p = graft.Tables.part(spark, dir)
      val a = p.select(col("p_brand").as("brand"),
        col("p_partkey").as("key_a"), col("p_name").as("name_a"))
      val b = p.select(col("p_brand").as("brand"),
        col("p_partkey").as("key_b"), col("p_name").as("name_b"))
      a.join(b, a("brand") === b("brand") && col("key_a") < col("key_b") &&
          abs(length(col("name_a")) - length(col("name_b"))) <= k &&
          levenshtein(col("name_a"), col("name_b"), k) =!= -1)
        .select(a("brand"), col("key_a"), col("key_b"),
          levenshtein(col("name_a"), col("name_b")).as("dist"))
    }
    def withBag(dir: String): DataFrame =
      graft.operators.Dedup.fuzzyMatch.build(spark, dir)
    def time(label: String, mk: String => DataFrame): Unit = {
      mk("/root/testdata/sf0.001").count()  // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk(sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[fuzzycompare] $label%-10s min=${ts.min}%6.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // interleave to spread host-steal noise across both variants
    (1 to 2).foreach { _ =>
      time("no-bag", noBag)
      time("bag", withBag)
    }
    spark.stop()
  }
}
