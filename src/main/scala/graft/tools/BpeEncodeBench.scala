package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (not part of the engine surface): measure the fixpoint
  * BPE ENCODE path at production merge depth — the PERF row for the
  * round-9 encoder rewrite (plan is O(1) in merge count, so the same
  * code must run at 256+ merges; the old per-merge foldLeft could
  * not).
  *
  * Flow: read an open-vocab corpus (generate with
  * [[GenOpenVocabCorpus]] first), train `merges` merges with the
  * exact batched trainer, then time `encodeStatsFrom` end-to-end
  * (min of `reps`) and report corpus tokens/sec. Also times bare
  * PLANNING at 8 vs 4096 merges to show analysis cost is flat.
  *
  * `runMain graft.tools.BpeEncodeBench [<dir> [merges reps]]`
  */
object BpeEncodeBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_bpe_open")
    val merges = args.lift(1).map(_.toInt).getOrElse(256)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Bpe

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val nDocs = docs.count()

    var t0 = System.nanoTime()
    var rounds = 0
    val table = Bpe.trainBatched(docs, merges, batch = 32,
      onRound = (r, _) => rounds = r).localCheckpoint()
    val nLearned = table.count()
    println(f"[encbench] trained $nLearned merges in $rounds rounds, " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    def encodeOnce(): (Double, Long) = {
      val t = System.nanoTime()
      val row = Bpe.encodeStatsFrom(docs, table)
        .agg(sum(col("n_tokens"))).collect()(0)
      ((System.nanoTime() - t) / 1e9, row.getLong(0))
    }
    val runs = (1 to reps).map(_ => encodeOnce())
    val best = runs.map(_._1).min
    val toks = runs.head._2
    println(f"[encbench] encode $nDocs%d docs / $toks%d tokens at " +
      f"depth $nLearned: best ${best}%.2f s = ${toks / best / 1e6}%.2f M tokens/s")

    // planning cost vs merge depth — must be flat (the O(1)-plan gate)
    import spark.implicits._
    def planMs(n: Int): Double = {
      val m = (1 to n).map(i => (i, s"l$i", s"r$i", 1L))
        .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      val t = System.nanoTime()
      Bpe.encodeStatsFrom(docs.limit(1), m).queryExecution.executedPlan
      (System.nanoTime() - t) / 1e6
    }
    println(f"[encbench] plan analysis: 8 merges ${planMs(8)}%.0f ms, " +
      f"4096 merges ${planMs(4096)}%.0f ms")
    spark.stop()
  }
}
