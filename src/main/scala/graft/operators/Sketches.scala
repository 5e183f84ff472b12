package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysis
import graft.functions.TextAnalysis.asciiLower

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
        regexp_extract_all(asciiLower(col("text")), lit("[a-z]+"), lit(0)))
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
       |  SELECT unnest(regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z]+')) AS term
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

  /** KMV sketch size: std error ≈ 1/√(k−2) ≈ 12.7%. */
  val KmvK = 64

  /** 63·2³¹ — the KMV estimator numerator (k−1)·|hash space|. */
  private val KmvNum = (KmvK - 1).toLong * 2147483648L

  /** The deterministic KMV hash: the xorshift-multiply mix of
    * [[Similarity.randProj]]'s sign hash over a single id — uniform in
    * [0, 2³¹), identical arithmetic in both engines. */
  private[operators] def kmvMix(c: Column): Column = {
    val h1 = (c.cast("long") * 2654435761L + 12345L) % 2147483648L
    val h2 = h1.bitwiseXOR(shiftright(h1, 13))
    (h2 * 1274126177L) % 2147483648L
  }

  /** KMV (k-minimum-values) distinct-set sketches with SET-OPERATION
    * estimates — Beyer et al. SIGMOD 2007: keep the k smallest distinct
    * hash values per set; |X| ≈ (k−1)·M/h₍k₎, and because min-k is a
    * MERGEABLE monoid the union sketch is min-k of the merged sketches
    * and the intersection estimate is ρ/k of the union estimate (ρ =
    * union-sketch values present in both input sketches). The
    * capability HLL deliberately lacks: `q_approx_distinct` answers
    * "how many", this answers "how much do two sets OVERLAP" from two
    * 64-value summaries — at 100 TB the sketches are per-partition
    * artifacts merged like [[IncrementalAgg]]'s sketch MV, and the
    * repeat-customer question (H1 ∩ H2 buyers) never re-scans a slice.
    *
    * Scale shape: per slice ONE distinct-hash shuffle (on uniform
    * 31-bit keys) topped by per-partition top-k (Spark plans
    * `TakeOrderedAndProject` — k·P rows to the driver, k = 64);
    * everything downstream is 64-row broadcast metadata. All-integer
    * estimator (floor division), so the oracle replays the estimates
    * hash-exactly — accuracy vs exact counts is pinned in the spec
    * (±25% at the measured fixture, 1/√62 theory). */
  val kmvSketch: Op = Op(
    "q_kmv_sketch",
    s"""WITH o AS (
       |  SELECT o_custkey AS c,
       |    max(CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 0 END) = 1 AS in_a,
       |    max(CASE WHEN year(o_orderdate) >= 1998 THEN 1 ELSE 0 END) = 1 AS in_b
       |  FROM orders GROUP BY 1
       |), m AS (
       |  SELECT in_a, in_b, (c * 2654435761 + 12345) % 2147483648 AS h1
       |  FROM o
       |), hv AS (
       |  SELECT in_a, in_b,
       |    (xor(h1, h1 // 8192) * 1274126177) % 2147483648 AS hv
       |  FROM m
       |), sa AS (
       |  SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS r
       |                  FROM (SELECT DISTINCT hv FROM hv WHERE in_a))
       |  WHERE r <= $KmvK
       |), sb AS (
       |  SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS r
       |                  FROM (SELECT DISTINCT hv FROM hv WHERE in_b))
       |  WHERE r <= $KmvK
       |), su AS (
       |  SELECT hv FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS r
       |                  FROM (SELECT hv FROM sa UNION SELECT hv FROM sb))
       |  WHERE r <= $KmvK
       |), stats AS (
       |  SELECT (SELECT max(hv) FROM sa) AS ha,
       |         (SELECT count(*) FROM sa) AS ma,
       |         (SELECT max(hv) FROM sb) AS hb,
       |         (SELECT count(*) FROM sb) AS mb,
       |         (SELECT max(hv) FROM su) AS hu,
       |         (SELECT count(*) FROM su) AS mu,
       |         (SELECT count(*) FROM su
       |            JOIN sa USING (hv) JOIN sb USING (hv)) AS rho
       |)
       |SELECT CAST($KmvK AS BIGINT) AS k,
       |  CAST(CASE WHEN ma < $KmvK THEN ma ELSE $KmvNum // ha END AS BIGINT) AS est_a,
       |  CAST(CASE WHEN mb < $KmvK THEN mb ELSE $KmvNum // hb END AS BIGINT) AS est_b,
       |  CAST(CASE WHEN mu < $KmvK THEN mu ELSE $KmvNum // hu END AS BIGINT) AS est_union,
       |  CAST(CASE WHEN mu < $KmvK THEN rho
       |       ELSE rho * ($KmvNum // hu) // $KmvK END AS BIGINT) AS est_inter,
       |  CAST(rho AS BIGINT) AS rho
       |FROM stats""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("c"))
      .agg(max(when(year(col("o_orderdate")) <= 1997, 1).otherwise(0)).as("ia"),
        max(when(year(col("o_orderdate")) >= 1998, 1).otherwise(0)).as("ib"))
    // ONE pass builds BOTH sides' distinct hash sets (r15): hash, then
    // group by hv carrying per-side presence flags — the former
    // kmvSketchOf-per-side shape re-ran the orders scan + customer
    // aggregate and a distinct shuffle once per side. max(flag) per hv
    // ≡ "hv present in that side" ≡ distinct(hv | side), the same set.
    val hv = o.select(kmvMix(col("c")).as("hv"), col("ia"), col("ib"))
      .groupBy(col("hv"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
      .localCheckpoint()
    kmvStatsHashed(hv.filter(col("ia") === 1).select(col("hv")),
      hv.filter(col("ib") === 1).select(col("hv")))
  }

  /** The KMV sketch stage over one id frame (`c` column): k smallest
    * distinct hash values. Global sort+limit, which Spark plans as
    * `TakeOrderedAndProject` — per-partition top-k merged at the
    * driver, k·P rows moved, never a full sort (gated in KmvSpec
    * against THIS frame; [[kmvStats]] checkpoints it, so the stage is
    * invisible in the final plan). */
  private[operators] def kmvSketchOf(x: DataFrame): DataFrame =
    x.select(kmvMix(col("c")).as("hv")).distinct()
      .orderBy(col("hv")).limit(KmvK)

  /** [[kmvSketch]] kernel over two id frames (one `c` column each).
    * Small-set fallback (Beyer et al. §3): a sketch holding m < k
    * values IS the exact distinct hash set — the (k−1)·M/h₍k₎ formula
    * would return ~k−1 regardless of the true count, so below k the
    * estimate is the exact m (and the intersection estimate is the
    * exact ρ when the UNION sketch is exact, which implies both input
    * sketches are too). Same branch in the oracle SQL. */
  def kmvStats(a: DataFrame, b: DataFrame): DataFrame =
    kmvStatsHashed(a.select(kmvMix(col("c")).as("hv")).distinct(),
      b.select(kmvMix(col("c")).as("hv")).distinct())

  /** [[kmvStats]] over PRE-HASHED distinct `hv` frames — the registered
    * op passes slices of one flagged hash frame so both sketches (and
    * the union) derive from a single distinct pass. */
  private[operators] def kmvStatsHashed(a: DataFrame, b: DataFrame)
      : DataFrame = {
    val sa = a.orderBy(col("hv")).limit(KmvK).localCheckpoint()
    val sb = b.orderBy(col("hv")).limit(KmvK).localCheckpoint()
    val su = sa.union(sb).distinct().orderBy(col("hv")).limit(KmvK)
      .localCheckpoint()
    val rho = su.join(broadcast(sa), "hv").join(broadcast(sb), "hv")
      .agg(count(lit(1)).as("rho"))
    sa.agg(max(col("hv")).as("ha"), count(lit(1)).as("ma"))
      .crossJoin(broadcast(
        sb.agg(max(col("hv")).as("hb"), count(lit(1)).as("mb"))))
      .crossJoin(broadcast(
        su.agg(max(col("hv")).as("hu"), count(lit(1)).as("mu"))))
      .crossJoin(broadcast(rho))
      .select(lit(KmvK.toLong).as("k"),
        expr(s"CAST(CASE WHEN ma < $KmvK THEN ma" +
          s" ELSE $KmvNum div ha END AS BIGINT)").as("est_a"),
        expr(s"CAST(CASE WHEN mb < $KmvK THEN mb" +
          s" ELSE $KmvNum div hb END AS BIGINT)").as("est_b"),
        expr(s"CAST(CASE WHEN mu < $KmvK THEN mu" +
          s" ELSE $KmvNum div hu END AS BIGINT)").as("est_union"),
        expr(s"CAST(CASE WHEN mu < $KmvK THEN rho" +
          s" ELSE rho * ($KmvNum div hu) div $KmvK END AS BIGINT)")
          .as("est_inter"),
        col("rho"))
  }
}
