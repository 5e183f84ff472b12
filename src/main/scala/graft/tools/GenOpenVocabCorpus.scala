package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness (not part of the engine surface): generate an
  * OPEN-vocabulary corpus for the batched-BPE occupancy measurement
  * (PERF.md). The driver testdata and the 10× soak corpus both ride a
  * closed ~31-word template, which saturates the word-type table and
  * bounds batch occupancy through symbol conflicts (every frequent
  * pair shares one of a handful of symbols); a real corpus has a
  * Zipf-ranked open vocabulary whose head pairs are symbol-DIVERSE,
  * which is exactly the regime the batched trainer's disjoint-prefix
  * rule is claimed to exploit. This generator measures that claim
  * instead of arguing it.
  *
  * Structure: `vocabSize` word types, surface forms are seeded random
  * [a-z] strings of length 3–12 (26 symbols ⇒ diverse adjacent pairs);
  * token frequencies follow Zipf rank-frequency (weight ∝ 1/rank, the
  * published law for natural text); documents draw 50–200 tokens from
  * that distribution. Schema matches the driver testdata's documents
  * table. Deterministic (seed 42).
  *
  * `runMain graft.tools.GenOpenVocabCorpus [<outDir> [nDocs vocabSize]]`
  */
object GenOpenVocabCorpus {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_bpe_open")
    val nDocs = args.lift(1).map(_.toInt).getOrElse(50000)
    val vocabSize = args.lift(2).map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rnd = new java.util.Random(42)
    // surface forms: length 3-12 random lowercase strings, de-duplicated
    // so rank identity is stable
    val seen = scala.collection.mutable.Set.empty[String]
    val vocab = new Array[String](vocabSize)
    var i = 0
    while (i < vocabSize) {
      val len = 3 + rnd.nextInt(10)
      val sb = new StringBuilder(len)
      var j = 0
      while (j < len) { sb.append(('a' + rnd.nextInt(26)).toChar); j += 1 }
      val w = sb.toString
      if (!seen.contains(w)) { seen += w; vocab(i) = w; i += 1 }
    }
    // Zipf cumulative weights over ranks 1..vocabSize
    val cum = new Array[Double](vocabSize)
    var acc = 0.0
    i = 0
    while (i < vocabSize) { acc += 1.0 / (i + 1); cum(i) = acc; i += 1 }
    val total = cum(vocabSize - 1)
    def draw(): String = {
      val x = rnd.nextDouble() * total
      var lo = 0; var hi = vocabSize - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cum(mid) < x) lo = mid + 1 else hi = mid
      }
      vocab(lo)
    }
    val langs = Seq("en", "zh", "es", "fr", "de")
    val docs = (0 until nDocs).map { id =>
      val n = 50 + rnd.nextInt(151)
      val text = Seq.fill(n)(draw()).mkString(" ")
      (id.toLong, text, langs(rnd.nextInt(langs.length)),
        s"src_${rnd.nextInt(20)}", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[genopen] wrote $nDocs docs, $vocabSize-type Zipf vocab → $out")
    spark.stop()
  }
}
