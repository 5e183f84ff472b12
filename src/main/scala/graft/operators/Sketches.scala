package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysis

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) —
  * the mergeable fixed-size frequency summary that complements the
  * engine's existing sketch row (`q_approx_distinct` HLL,
  * `q_approx_quantile` KLL-style, `q_heavy_hitters` exact top-k).
  *
  * Why it matters at 100 TB: an exact per-term count table is
  * vocabulary-sized (unbounded — URLs, typos, hashes make the long tail
  * grow with the corpus), while the CMS is EXACTLY `depth × width`
  * counters no matter the corpus. Each partition reduces its token
  * stream to (seed, bucket, partial-sum) rows — map-side combinable,
  * fixed size per partition — and partial sketches merge by elementwise
  * addition, which is what makes the structure work for streaming,
  * cross-day rollup, and multi-cluster union without a re-scan
  * (mergeability is pinned in [[SketchesSpec]]).
  *
  * Everything is deterministic and integer-only: the d row-hashes are
  * the engine's portable rolling-hash fingerprint over `"<seed>:" +
  * term` mod width, so DuckDB replays the exact sketch and the op is
  * hash-verified, not approximate-trusted. Point estimates take the MIN
  * over the d rows (one-sided error: the spec pins est ≥ true for
  * EVERY term, the CMS overcount guarantee).
  *
  * Reference anchor: nothing in the reference approximates — its
  * count surfaces are exact SQL aggregates (e.g. the run-tally in
  * scripts/pricing/02_normalize_scryfall_prices.js:214-224); the CMS
  * is the north-star extension for count surfaces that cannot stay
  * exact at corpus scale.
  */
object Sketches {

  /** Sketch geometry: d=4 rows × w=512 counters = 2048 cells. At this
    * width the standard bound gives per-probe overcount ≤ e·N/512 with
    * prob 1−e⁻⁴ — enough to rank the Zipf head exactly on this corpus
    * (the spec does not rely on that; it pins the one-sided property).
    */
  val CmsDepth  = 4
  val CmsWidth  = 512
  val CmsProbes = 10

  /** Exact per-term counts of the corpus (the stream being sketched). */
  private[operators] def termCounts(docs: DataFrame): DataFrame =
    docs
      .select(explode(
        regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
        .as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))

  /** The d portable row-hashes of `term`: array of (seed, bucket). */
  private def seedBuckets(term: Column): Column =
    array((0 until CmsDepth).map { s =>
      struct(
        lit(s).cast("int").as("seed"),
        (TextAnalysis.fingerprint(concat(lit(s"$s:"), term)) % CmsWidth)
          .as("bucket"))
    }: _*)

  /** The (seed, bucket, bucket_cnt) sketch of a term-count frame:
    * ≤ d·w rows regardless of corpus size. */
  private[operators] def sketchOf(counts: DataFrame): DataFrame =
    counts
      .select(col("cnt"), explode(seedBuckets(col("term"))).as("sb"))
      .groupBy(col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
      .agg(sum(col("cnt")).as("bucket_cnt"))

  /** Registered op: sketch the corpus token stream, then point-query
    * the exact top-[[CmsProbes]] terms against the sketch — output
    * (term, true_cnt, est_cnt) so the overcount is visible. The probe
    * join broadcasts the fixed-size sketch; the only corpus-scaled
    * shuffle is the pre-aggregated (term, cnt) table the sketch and the
    * probe head both reduce from. */
  val cmsSketch: Op = Op(
    "q_cms_sketch",
    s"""WITH t AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
       |  FROM documents
       |), c AS (
       |  SELECT term, COUNT(*) AS cnt FROM t GROUP BY term
       |), h AS (
       |  SELECT s.seed, c.term, c.cnt,
       |    list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform(
       |          string_split(CAST(s.seed AS VARCHAR) || ':' || c.term, ''),
       |          ch -> CAST(ascii(ch) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % 1000000007) % $CmsWidth AS bucket
       |  FROM c CROSS JOIN (SELECT unnest([0,1,2,3]) AS seed) s
       |), sk AS (
       |  SELECT seed, bucket, SUM(cnt) AS bucket_cnt FROM h GROUP BY 1, 2
       |), probe AS (
       |  SELECT term, cnt FROM c ORDER BY cnt DESC, term LIMIT $CmsProbes
       |)
       |SELECT p.term, CAST(p.cnt AS BIGINT) AS true_cnt,
       |       CAST(MIN(sk.bucket_cnt) AS BIGINT) AS est_cnt
       |FROM probe p
       |JOIN h  ON h.term = p.term
       |JOIN sk ON sk.seed = h.seed AND sk.bucket = h.bucket
       |GROUP BY p.term, p.cnt""".stripMargin) { (spark, dir) =>
    // the (term, cnt) table feeds BOTH the sketch and the probe head;
    // localCheckpoint materializes the corpus aggregate once so neither
    // consumer re-scans the documents (vocab-sized, not corpus-sized)
    val counts = termCounts(Tables.documents(spark, dir)).localCheckpoint()
    val sketch = sketchOf(counts)
    val probes = counts
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(CmsProbes)
    estimate(probes, sketch)
  }

  /** Point-query `probes` (term, cnt) against a sketch: min over the d
    * row counters. The sketch is fixed-size → broadcast. */
  private[operators] def estimate(
      probes: DataFrame, sketch: DataFrame): DataFrame =
    probes
      .select(col("term"), col("cnt"),
        explode(seedBuckets(col("term"))).as("sb"))
      .join(broadcast(sketch),
        col("sb.seed") === col("seed") && col("sb.bucket") === col("bucket"))
      .groupBy(col("term"), col("cnt"))
      .agg(min(col("bucket_cnt")).as("est_cnt"))
      .select(col("term"), col("cnt").as("true_cnt"), col("est_cnt"))
}
