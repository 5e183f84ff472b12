package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysis.wordShingles

/** Dev profiling harness (not part of the engine surface): stage-level
  * timings for the dedup family to locate hot spots. */
object Profile {
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

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    time("docs count")(docs.count())
    val sh = docs.select(col("doc_id"), col("lang"), col("source"),
      wordShingles(col("text"), 3).as("sh"))
    time("shingled count")(sh.count())
    time("shingled count (2nd)")(sh.count())
    val ex = sh.select(col("lang"), col("source"), col("doc_id"),
      size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
    time("explode count")(ex.count())
    val freq = ex.groupBy(col("lang"), col("source"), col("s"))
      .agg(count(lit(1)).as("df"))
    time("freq count")(freq.count())
    val joined = ex.join(freq, Seq("lang", "source", "s"))
    time("postings join count")(joined.count())
    time("full q_ngram_jaccard")(
      graft.operators.Dedup.ngramJaccard.build(spark, dir).count())
    time("full q_minhash_lsh")(
      graft.operators.Dedup.minhashLsh.build(spark, dir).count())
    time("full q_simhash")(
      graft.operators.Dedup.simhash.build(spark, dir).count())

    val ev = Tables.events(spark, dir)
    time("events count")(ev.count())
    time("events count (2nd)")(ev.count())
    val evp = ev.select(col("user_id").as("card_key"),
      col("event_type").as("grade"),
      round(col("value") * 100).cast("long").as("sold_cents"),
      to_date(col("ts")).as("sold_date"), col("event_id"))
    time("events projected")(evp.count())
    time("anchor probe")(evp.agg(max(col("sold_date"))).head)
    val grouped = evp.groupBy(col("card_key"), col("grade"))
    time("percentile x3 array")(grouped.agg(
      percentile(col("sold_cents"), array(lit(0.5), lit(0.25), lit(0.75)))).count())
    time("max_by struct")(grouped.agg(
      max_by(col("sold_cents"), struct(col("sold_date"), col("event_id")))).count())
    time("count/max only")(grouped.agg(count(lit(1)), max(col("sold_date"))).count())
    time("full q_sales_rollup")(
      graft.operators.Rollup.rollup.build(spark, dir).count())
    spark.stop()
  }
}
