package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness (not part of the engine surface): time BPE induction —
  * sequential vs batched vs full-batch — at production-ish merge
  * counts (PERF.md's rounds/sec rows):
  * `runMain graft.tools.BpeTrainBench <sfDir> <numMerges> <batch> [mode]`
  * (batch 1 runs the driver-steered [[graft.operators.Bpe.train]];
  * mode "full" runs the approximate [[graft.operators.Bpe
  * .trainFullBatch]] with k = batch; mode "overlap" additionally runs
  * sequential greedy to the same depth and reports the merge-set
  * overlap — the approximation's quality measure).
  */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_soak_sf1e")
    val merges = args.lift(1).map(_.toInt).getOrElse(256)
    val batch = args.lift(2).map(_.toInt).getOrElse(32)
    val mode = args.lift(3).getOrElse("exact")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
    val perRound = scala.collection.mutable.ArrayBuffer.empty[Int]
    val t0 = System.nanoTime()
    val m =
      if (mode == "full" || mode == "overlap")
        graft.operators.Bpe.trainFullBatch(docs, Int.MaxValue, batch,
          merges, (_, accepted) => perRound += accepted)
      else if (batch <= 1) graft.operators.Bpe.train(docs, merges)
      else graft.operators.Bpe.trainBatched(docs, merges, batch,
        (_, accepted) => perRound += accepted)
    val n = m.count()
    val secs = (System.nanoTime() - t0) / 1e9
    if (mode == "overlap") {
      val par = m.collect()
        .map(r => (r.getAs[String]("left_sym"),
          r.getAs[String]("right_sym"))).toSet
      val seq = graft.operators.Bpe.train(docs, n.toInt).collect()
        .map(r => (r.getAs[String]("left_sym"),
          r.getAs[String]("right_sym"))).toSet
      println(f"[bpebench] merge-set overlap vs sequential greedy at " +
        f"depth $n%d: ${par.intersect(seq).size}%d/${n}%d " +
        f"(${100.0 * par.intersect(seq).size / n}%.1f%%)")
    }
    val rounds = perRound.size
    val occ = if (rounds > 0) f"${perRound.sum.toDouble / rounds}%.1f" else "n/a"
    def meanOf(xs: collection.Seq[Int]) =
      if (xs.isEmpty) "n/a" else f"${xs.sum.toDouble / xs.size}%.1f"
    val q = rounds / 4
    val trend = if (rounds >= 8)
      s" occFirstQ=${meanOf(perRound.take(q))}" +
        s" occLastQ=${meanOf(perRound.takeRight(q))}"
    else ""
    println(f"[bpebench] dir=$dir merges=$n%d (asked $merges) batch=$batch " +
      f"rounds=${if (batch <= 1) n else rounds}%d occupancy=$occ$trend " +
      f"wall=$secs%.1f s  merges/sec=${n / secs}%.2f")
    spark.stop()
  }
}
