package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev measurement: recall of alternate simhash band geometries against
  * the exact in-scope near-dup pair set (the oracle contract), per SF.
  * The 4×16 geometry only GUARANTEES Hamming ≤ 3 by pigeonhole, while
  * in-scope pairs on this corpus reach Hamming 7 — this measures whether
  * the probabilistic tail (pairs at Hamming 4..7 still sharing one
  * 16-bit band) is deterministically covered on the fixed testdata.
  *
  * `runMain graft.tools.SimhashGeom [<sfDir> ...]`
  */
object SimhashGeom {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (dir <- dirs) {
      // the oracle pair set = current green op output (exact-verified)
      val truthJ = Dedup.simhash.build(spark, dir).cache()
      val truth = truthJ.select(col("doc_id_a"), col("doc_id_b"))
      val nTrue = truth.count()
      val sigs = Dedup.simhashSignatures(spark, dir).cache()
      // J vs signature-Hamming for in-scope true pairs: which J threshold
      // makes radius 3 (the 4-band pigeonhole guarantee) lossless?
      val withH = truthJ
        .join(sigs.select(col("doc_id").as("doc_id_a"), col("simhash").as("sa")),
          Seq("doc_id_a"))
        .join(sigs.select(col("doc_id").as("doc_id_b"), col("simhash").as("sb")),
          Seq("doc_id_b"))
        .select(col("jaccard"),
          bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      println(s"[geom] $dir J-bucket x max-hamming:")
      withH.groupBy(floor(col("jaccard") * 10).as("jb"))
        .agg(count(lit(1)).as("n"), max(col("hamming")).as("max_h"))
        .orderBy(col("jb")).show(12, false)
      // hamming vs pair min shingle-count: is there a doc-length gate
      // above which radius 3 is measured-lossless?
      val sizes = Dedup.shingleRowsWithSize(spark, dir)
        .select(col("doc_id"), col("n_sh")).distinct()
      val withSz = truthJ
        .join(sizes.select(col("doc_id").as("doc_id_a"), col("n_sh").as("n_a")),
          Seq("doc_id_a"))
        .join(sizes.select(col("doc_id").as("doc_id_b"), col("n_sh").as("n_b")),
          Seq("doc_id_b"))
        .join(sigs.select(col("doc_id").as("doc_id_a"), col("simhash").as("sa")),
          Seq("doc_id_a"))
        .join(sigs.select(col("doc_id").as("doc_id_b"), col("simhash").as("sb")),
          Seq("doc_id_b"))
        .select(least(col("n_a"), col("n_b")).as("min_sh"),
          bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
        .cache()
      for (gate <- Seq(32, 48, 64, 96, 128, 192, 256)) {
        val g = withSz.filter(col("min_sh") >= gate)
          .agg(count(lit(1)).as("n"), max(col("hamming")).as("mh")).head()
        println(s"[geom] $dir gate=$gate: pairs=${g.getLong(0)} " +
          s"max_hamming=${if (g.isNullAt(1)) "-" else g.get(1)}")
      }
      withSz.unpersist()
      // does the lossless size prefilter (J>=0.5 => length ratio >= 0.5)
      // kill the quadratic same-band Hamming<=7 mass? candidates with
      // and without the size band, per geometry
      for ((bands, bits, cut) <- Seq((8, 8, None), (4, 16, Some(7)))) {
        val cand = Dedup.simhashCandidatesOf(sigs, bands, bits, cut)
          .select(col("doc_id_a"), col("doc_id_b"))
          .join(sizes.select(col("doc_id").as("doc_id_a"), col("n_sh").as("n_a")),
            Seq("doc_id_a"))
          .join(sizes.select(col("doc_id").as("doc_id_b"), col("n_sh").as("n_b")),
            Seq("doc_id_b"))
          .filter(least(col("n_a"), col("n_b")) * 2 >=
            greatest(col("n_a"), col("n_b")))
        println(s"[geom] $dir ${bands}x$bits cut=${cut.getOrElse(bands - 1)} " +
          s"+sizeband: cand=${cand.count()}")
      }
      for ((bands, bits, cut) <- Seq((8, 8, None), (4, 16, Some(7)),
          (4, 16, None), (2, 32, Some(7)))) {
        val cand = Dedup.simhashCandidatesOf(sigs, bands, bits, cut)
          .select(col("doc_id_a"), col("doc_id_b"))
        // candidates are pre-scope-gate (all docs) so coverage is
        // conservative vs the op's gated wiring
        val missed = truth.join(cand, Seq("doc_id_a", "doc_id_b"), "left_anti")
        val nMissed = missed.count()
        val nCand = cand.count()
        println(s"[geom] $dir ${bands}x$bits cut=${cut.getOrElse(bands - 1)}: " +
          s"true=$nTrue cand=$nCand missed=$nMissed")
        if (nMissed > 0) missed.show(20, false)
      }
      truth.unpersist(); sigs.unpersist()
    }
    spark.stop()
  }
}
