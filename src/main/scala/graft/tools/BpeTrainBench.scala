package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness (not part of the engine surface): time BPE induction —
  * sequential vs batched — at production-ish merge counts (PERF.md's
  * rounds/sec row):
  * `runMain graft.tools.BpeTrainBench <sfDir> <numMerges> <batch>`
  * (batch 1 runs the driver-steered [[graft.operators.Bpe.train]]).
  */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_soak_sf1e")
    val merges = args.lift(1).map(_.toInt).getOrElse(256)
    val batch = args.lift(2).map(_.toInt).getOrElse(32)
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
      if (batch <= 1) graft.operators.Bpe.train(docs, merges)
      else graft.operators.Bpe.trainBatched(docs, merges, batch,
        (_, accepted) => perRound += accepted)
    val n = m.count()
    val secs = (System.nanoTime() - t0) / 1e9
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
