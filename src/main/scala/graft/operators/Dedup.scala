package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysis.wordShingles

/** Deduplication family for training-data pipelines (north star):
  * exact, blocked n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design:
  *  - exact dedup = one hash aggregation on the normalized text — the
  *    shuffle key is the content itself, perfectly spread.
  *  - blocked Jaccard is quadratic per block — correct as an oracle-able
  *    baseline, but the 100 TB path is MinHash/LSH below.
  *  - MinHash+LSH: per-doc signature (map-only), explode to (band,
  *    bucket) keys, self-join within buckets — candidate generation is
  *    linear in docs + bucket collisions, never all-pairs. Oversized
  *    buckets (degenerate content) are capped to bound the worst case.
  *  - SimHash: per-doc 64-bit signature (map-only); banded into 4×16-bit
  *    keys so any pair within Hamming distance 3 shares ≥1 band.
  */
object Dedup {

  /** Exact dedup on normalized text (lower + collapse whitespace). */
  val dedupExact: Op = Op(
    "q_dedup_exact",
    """SELECT regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm,
      |       CAST(min(doc_id) AS BIGINT) AS rep_doc_id,
      |       COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .groupBy(regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("norm"))
      .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_copies"))
  }

  private def shingled(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"), col("source"),
      wordShingles(col("text"), 3).as("sh"))

  /** Blocked exact n-gram Jaccard: candidate pairs share (lang, source),
    * similarity = |A∩B| / |A∪B| over distinct 3-word shingles. */
  val ngramJaccard: Op = Op(
    "q_ngram_jaccard",
    """WITH d AS (
      |  SELECT doc_id, lang, source,
      |         string_split_regex(lower(trim(text)), '\s+') AS w
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, lang, source,
      |         CASE WHEN len(w) >= 3
      |              THEN list_distinct(list_transform(range(1, len(w)-1),
      |                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
      |              ELSE [array_to_string(w, ' ')] END AS sh
      |  FROM d
      |), pairs AS (
      |  SELECT a.lang, a.source, a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
      |         len(list_intersect(a.sh, b.sh)) AS inter_size,
      |         len(list_distinct(list_concat(a.sh, b.sh))) AS union_size
      |  FROM sh a JOIN sh b
      |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      |)
      |SELECT lang, source, doc_id_a, doc_id_b, inter_size, union_size,
      |       CAST(inter_size AS DOUBLE) / CAST(union_size AS DOUBLE) AS jaccard
      |FROM pairs
      |WHERE CAST(inter_size AS DOUBLE) / CAST(union_size AS DOUBLE) >= 0.5""".stripMargin) { (spark, dir) =>
    val d = shingled(spark, dir)
    val a = d.select(col("lang"), col("source"),
      col("doc_id").as("doc_id_a"), col("sh").as("sh_a"))
    val b = d.select(col("lang"), col("source"),
      col("doc_id").as("doc_id_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(array_union(col("sh_a"), col("sh_b")))
    a.join(b, Seq("lang", "source"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("lang"), col("source"), col("doc_id_a"), col("doc_id_b"),
        inter.as("inter_size"), union.as("union_size"),
        (inter.cast("double") / union.cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  /** MinHash signature as an array column: element i =
    * min over shingles of xxhash64(i, shingle). */
  def minhashSignature(sh: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(sh, s => xxhash64(lit(i), s)))): _*)

  /** MinHash + LSH near-dup pairs, verified by exact Jaccard.
    *
    * k=32 hashes, 8 bands × 4 rows → candidate recall kicks in around
    * J≈0.5. Candidates sharing any band bucket are verified exactly, so
    * the output contains no false positives; the LSH stage exists purely
    * to avoid the all-pairs join. No DuckDB oracle: xxhash64 is
    * Spark-specific (rows-only check; the exact-Jaccard twin
    * q_ngram_jaccard is the oracled baseline).
    */
  val minhashLsh: Op = Op.noOracle("q_minhash_lsh") { (spark, dir) =>
    val bands = 8
    val rowsPerBand = 4
    val d = shingled(spark, dir)
      .select(col("doc_id"), col("sh"),
        minhashSignature(col("sh"), bands * rowsPerBand).as("sig"))
    val banded = d.select(col("doc_id"), col("sh"),
      posexplode(array((0 until bands).map(bnd =>
        xxhash64(lit(bnd) +: (0 until rowsPerBand)
          .map(r => element_at(col("sig"), bnd * rowsPerBand + r + 1)): _*)): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    // cap degenerate buckets: at 100 TB one viral boilerplate string must
    // not turn a bucket into an all-pairs join
    val capped = banded.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bucket"))
          .orderBy(col("doc_id"))))
      .filter(col("rn") <= 1000)
    val a = capped.select(col("band"), col("bucket"),
      col("doc_id").as("doc_id_a"), col("sh").as("sh_a"))
    val b = capped.select(col("band"), col("bucket"),
      col("doc_id").as("doc_id_b"), col("sh").as("sh_b"))
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b", "sh_a", "sh_b")
      .dropDuplicates("doc_id_a", "doc_id_b")
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(array_union(col("sh_a"), col("sh_b")))
    cand.select(col("doc_id_a"), col("doc_id_b"),
        (inter.cast("double") / union.cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  /** SimHash: 64-bit signature = sign of per-bit vote over word hashes;
    * near-dup candidates = pairs sharing a 16-bit band (covers Hamming
    * distance ≤ 3), reported with their exact Hamming distance. */
  val simhash: Op = Op.noOracle("q_simhash") { (spark, dir) =>
    val d = Tables.documents(spark, dir).select(col("doc_id"),
      expr(
        """aggregate(
          |  sequence(0, 63),
          |  0L,
          |  (acc, j) -> acc + if(
          |    aggregate(
          |      transform(split(lower(trim(text)), '\\s+'), w -> xxhash64(w)),
          |      0L,
          |      (s, h) -> s + if(((h >> j) & 1) = 1, 1L, -1L)) > 0,
          |    shiftleft(1L, j), 0L))""".stripMargin).as("simhash"))
    val banded = d.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(bd =>
        shiftright(col("simhash"), bd * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    val a = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_id_a"), col("simhash").as("sig_a"))
    val bb = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_id_b"), col("simhash").as("sig_b"))
    a.join(bb, Seq("band", "bucket"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .dropDuplicates("doc_id_a", "doc_id_b")
      .filter(col("hamming") <= 3)
  }
}
