package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler (r14): stage-by-stage timing of the AllPairs prefix
  * pipeline under q_ngram_jaccard, on the bench session shape —
  * locates whether the cost is postings construction, the frequency
  * aggregate, the prefix window, pair generation, or exact verify. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ngram] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.operators.Dedup
    // warm the caches + codegen — fixture warmup only when the standard
    // fixture exists (r15 ADVICE: the hardcoded path crashed on
    // machines without it); the target-dir pass below always warms
    val fixture = "/root/testdata/sf0.001"
    if (new java.io.File(fixture).isDirectory)
      Dedup.ngramJaccard.build(spark, fixture).count()
    Dedup.ngramJaccard.build(spark, dir).count()
    val bare = graft.Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"), col("source"),
      explode(graft.functions.TextAnalysis.wordShingles(col("text"), 3))
        .as("s")) // the shingleRows construction, inlined (private there)
    timed("shingleRows (cached) count")(bare.count())
    val freq = bare.groupBy(col("lang"), col("source"), col("s"))
      .agg(count(lit(1)).as("df"))
    timed("freq agg count")(freq.count())
    val rowsJoin = bare.join(freq, Seq("lang", "source", "s"))
    timed("rows join freq count")(rowsJoin.count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("source"), col("doc_id"))
      .orderBy(col("df").asc, col("s").asc)
    timed("window rank count")(rowsJoin
      .withColumn("rn", row_number().over(w)).count())
    for (r <- 1 to 2)
      timed(s"full q_ngram_jaccard r$r")(
        Dedup.ngramJaccard.build(spark, dir).count())
    for (r <- 1 to 2)
      timed(s"full q_containment r$r")(
        Dedup.containment.build(spark, dir).count())
    // containment decomposition over the warm caches
    val rowsDf = Dedup.shingleRowsWithDf(spark, dir)
    timed("rowsDf (cached) count")(rowsDf.count())
    val cand = Dedup.containmentCandidatesOfDf(rowsDf, Dedup.ContainDfCap)
    println(s"[ngram] rowsDf rows = ${rowsDf.count()}")
    val rare = rowsDf.filter(col("df") <= Dedup.ContainDfCap)
    timed("rare filter count")(println(s"[ngram]   rare rows = ${rare.count()}"))
    val grouped = rare.groupBy(col("lang"), col("source"), col("s"))
      .agg(org.apache.spark.sql.functions.array_sort(
        collect_list(struct(col("doc_id"), col("n_sh")))).as("ds"))
    timed("rare grouped count")(println(s"[ngram]   groups = ${grouped.count()}"))
    timed("containment candidates r1")(println(s"[ngram]   cand = ${cand.count()}"))
    timed("containment candidates r2")(cand.count())
    val ver = Dedup.containmentVerify(cand, Dedup.shingleArrays(spark, dir))
    timed("containment verify r1")(ver.count())
    timed("containment verify r2")(ver.count())
    for (r <- 1 to 2)
      timed(s"full q_simhash r$r")(
        Dedup.simhash.build(spark, dir).count())
    spark.stop()
  }
}
