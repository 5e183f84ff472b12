package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time q_simhash (and stages) in isolation, repeated, to
  * separate codegen-compile cost from steady-state execution. */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // warmup something unrelated
    time("warmup q1_agg")(graft.SparkEntry.queries("q1_agg")(spark, dir).count())
    (1 to 3).foreach { i =>
      time(s"q_simhash run $i")(
        graft.SparkEntry.queries("q_simhash")(spark, dir).count())
    }
    (1 to 2).foreach { i =>
      time(s"signatures only run $i")(
        graft.operators.Dedup.simhashSignatures(spark, dir).count())
    }
    (1 to 2).foreach { i =>
      time(s"candidates only run $i")(
        graft.operators.Dedup.simhashCandidates(spark, dir).count())
    }
    // sub-plan timings of the candidate join
    locally {
      import org.apache.spark.sql.functions._
      val sigs = graft.operators.Dedup.simhashSignatures(spark, dir)
      def banded = sigs.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 8).map(bd =>
          shiftright(col("simhash"), bd * 8).bitwiseAND(lit(0xFFL))): _*)))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
      (1 to 2).foreach { i => time(s"banded leg run $i")(banded.count()) }
      val a = banded.alias("sa"); val b = banded.alias("sb")
      val joined = a.join(b,
        col("sa.band") === col("sb.band") &&
          col("sa.bucket") === col("sb.bucket") &&
          col("sa.doc_id") < col("sb.doc_id"))
      (1 to 2).foreach { i => time(s"raw band join run $i")(joined.count()) }
      val withHam = joined.select(col("sa.doc_id").as("doc_id_a"),
        col("sb.doc_id").as("doc_id_b"),
        bit_count(col("sa.simhash").bitwiseXOR(col("sb.simhash"))).as("hamming"))
      (1 to 2).foreach { i =>
        time(s"join+hamming run $i")(withHam.count())
      }
      (1 to 2).foreach { i =>
        time(s"dedup(no ham filter) run $i")(
          withHam.dropDuplicates("doc_id_a", "doc_id_b").count())
      }
    }
    (1 to 2).foreach { i =>
      time(s"q_minhash_lsh run $i")(
        graft.SparkEntry.queries("q_minhash_lsh")(spark, dir).count())
    }
    spark.stop()
  }
}
