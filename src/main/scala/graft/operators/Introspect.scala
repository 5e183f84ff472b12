package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Schema-on-read machinery from the reference's feed exporter:
  * nested-JSON image extraction (F11,
  * scripts/feeds/exportGoogleMerchantFeed.mjs:158-187) and runtime
  * catalog introspection driving conditional plan construction (S6,
  * exportGoogleMerchantFeed.mjs:189-214,258-269).
  */
object Introspect {

  /** Column-level data profiling (the ANALYZE/data-quality pass every
    * warehouse runs before trusting a feed): per-column row, null, and
    * exact distinct counts over the events table, one output row per
    * column. Each column profiles in its own aggregate over a
    * single-column pruned scan; at 100 TB the same shape runs as ONE
    * pass with `approx_count_distinct` sketches per column (the
    * q_approx_distinct machinery) — exact distincts here because the
    * oracle demands bit-exact numbers, and the per-column scans are
    * columnar-cheap. Distinct-counting doubles is equality-based (no
    * arithmetic), so engines agree bit-for-bit.
    */
  val profile: Op = Op(
    "q_profile",
    """SELECT 'user_id' AS column_name, COUNT(*) AS n_rows,
      |       COUNT(*) - COUNT(user_id) AS n_nulls,
      |       COUNT(DISTINCT user_id) AS n_distinct FROM events
      |UNION ALL
      |SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
      |       COUNT(DISTINCT event_type) FROM events
      |UNION ALL
      |SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
      |       COUNT(DISTINCT value) FROM events
      |UNION ALL
      |SELECT 'props', COUNT(*), COUNT(*) - COUNT(props),
      |       COUNT(DISTINCT props) FROM events""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir)
    def prof(c: String) = ev
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"))
      .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"))
    Seq("user_id", "event_type", "value", "props").map(prof)
      .reduce(_ unionAll _)
  }

  /** F11: extract an image URL from a JSON payload — prefer
    * `image_uris.large → normal → small`, else the first entry of
    * `card_faces[]` in the same order, else NULL. The payload is
    * synthesized deterministically from `part` (three shapes: top-level
    * uris / faces array / neither, with sizes knocked out by id parity
    * to exercise every coalesce branch), then parsed back with an
    * explicit schema — `from_json` returns null on missing keys, the
    * reference's tolerant-parse semantics (F23).
    *
    * Scale: construct + parse + extract is one codegen'd projection;
    * a malformed payload degrades to NULL, never a task failure.
    */
  val jsonImage: Op = Op(
    "q_json_image",
    """WITH src AS (
      |  SELECT p_partkey AS id, p_name,
      |    CASE
      |      WHEN p_partkey % 3 = 0 THEN json_object(
      |        'image_uris', json_object(
      |          'large',  CASE WHEN p_partkey % 2 = 0 THEN NULL ELSE 'L-' || p_name END,
      |          'normal', CASE WHEN p_partkey % 4 = 0 THEN NULL ELSE 'N-' || p_name END,
      |          'small',  'S-' || p_name))
      |      WHEN p_partkey % 3 = 1 THEN json_object(
      |        'card_faces', json_array(json_object(
      |          'image_uris', json_object(
      |            'large',  CASE WHEN p_partkey % 2 = 0 THEN NULL ELSE 'FL-' || p_name END,
      |            'normal', 'FN-' || p_name,
      |            'small',  'FS-' || p_name))))
      |      ELSE json_object('noise', 'x')
      |    END AS payload
      |  FROM part
      |)
      |SELECT id,
      |  COALESCE(
      |    json_extract_string(payload, '$.image_uris.large'),
      |    json_extract_string(payload, '$.image_uris.normal'),
      |    json_extract_string(payload, '$.image_uris.small'),
      |    json_extract_string(payload, '$.card_faces[0].image_uris.large'),
      |    json_extract_string(payload, '$.card_faces[0].image_uris.normal'),
      |    json_extract_string(payload, '$.card_faces[0].image_uris.small')) AS image
      |FROM src""".stripMargin) { (spark, dir) =>
    val uris = (prefix: String) => {
      // the face-variant (prefix "F") always has `normal` — decide that
      // at plan-construction time instead of a lit==lit predicate (which
      // Spark logs as a trivially-true comparison)
      val normal = concat(lit(s"${prefix}N-"), col("p_name"))
      struct(
        when(col("p_partkey") % 2 =!= 0, concat(lit(s"${prefix}L-"), col("p_name")))
          .as("large"),
        (if (prefix == "F") normal
         else when(col("p_partkey") % 4 =!= 0, normal)).as("normal"),
        concat(lit(s"${prefix}S-"), col("p_name")).as("small"))
    }
    val payload = when(col("p_partkey") % 3 === 0,
        to_json(struct(uris("").as("image_uris"))))
      .when(col("p_partkey") % 3 === 1,
        to_json(struct(array(struct(uris("F").as("image_uris")))
          .as("card_faces"))))
      .otherwise(to_json(struct(lit("x").as("noise"))))
    val uriSchema = StructType(Seq(
      StructField("large", StringType), StructField("normal", StringType),
      StructField("small", StringType)))
    val payloadSchema = StructType(Seq(
      StructField("image_uris", uriSchema),
      StructField("card_faces", ArrayType(StructType(Seq(
        StructField("image_uris", uriSchema)))))))
    Tables.part(spark, dir)
      .select(col("p_partkey").as("id"), payload.as("payload"))
      .select(col("id"), from_json(col("payload"), payloadSchema).as("p"))
      .select(col("id"), coalesce(
        col("p.image_uris.large"),
        col("p.image_uris.normal"),
        col("p.image_uris.small"),
        element_at(col("p.card_faces"), 1).getField("image_uris").getField("large"),
        element_at(col("p.card_faces"), 1).getField("image_uris").getField("normal"),
        element_at(col("p.card_faces"), 1).getField("image_uris").getField("small"))
        .as("image"))
  }

  /** S6: runtime catalog introspection — pick the first present column
    * from a candidate list by inspecting `df.columns` (the reference
    * probes information_schema for 7 card-id columns and an optional
    * feed_image_url), then build the plan conditionally. The oracle
    * pins what the probe must discover on this catalog.
    */
  val schemaProbe: Op = Op(
    "q_schema_probe",
    """SELECT 'p_brand' AS id_col_used, 'absent' AS image_col,
      |       COUNT(DISTINCT p_brand) AS n_ids
      |FROM part""".stripMargin) { (spark, dir) =>
    val df = Tables.part(spark, dir)
    val present = df.columns.toSet
    // reference probes candidates in a fixed order, first hit wins
    val idCandidates = Seq("tcg_card_id", "ygo_card_id", "p_brand", "p_partkey")
    val idCol = idCandidates.find(present.contains).getOrElse(
      sys.error("no id column candidate present"))
    val imageCol =
      if (present.contains("feed_image_url")) lit("present") else lit("absent")
    df.agg(countDistinct(col(idCol)).as("n_ids"))
      .select(lit(idCol).as("id_col_used"), imageCol.as("image_col"),
        col("n_ids"))
  }

  /** Equi-width value histogram (the data-profiling companion to
    * [[profile]]): bucket extended price into $5,000 bins with an
    * explicit `floor((x - lo)/width)` — the same IEEE expression in
    * both engines, so bucket edges agree bit-for-bit — and aggregate
    * count / min / max / an integer-cent sum per bin. The cent sum is
    * deliberately BIGINT: a DOUBLE sum's value depends on reduction
    * order, which no distributed engine should promise.
    *
    * One map-side-combinable aggregate over a two-column pruned scan;
    * the result is |buckets| rows. At 100 TB this is a single pass —
    * the shape every profiling/quality dashboard query should have. */
  val histogram: Op = Op(
    "q_histogram",
    """SELECT CAST(floor((l_extendedprice - 900.0) / 5000.0) AS BIGINT) AS bucket,
      |       COUNT(*) AS n,
      |       MIN(l_extendedprice) AS min_price,
      |       MAX(l_extendedprice) AS max_price,
      |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM lineitem
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .select(col("l_extendedprice"))
      .groupBy(floor((col("l_extendedprice") - lit(900.0)) / lit(5000.0))
        .cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_cents"))
  }

  /** Data-quality expectation suite (the deequ/Delta-expectations
    * shape): validate an incoming batch against declared constraints —
    * null rate, key uniqueness, enum domain, value range, referential
    * integrity — and emit one verdict row per check with exact
    * violation counts.
    *
    * The reference enforces these imperatively row-by-row at ingest
    * (scripts/pricing/01_import_pricecharting_csv.js:96-118 skips rows
    * with missing ids/names; its schema relies on PG constraints); at
    * 100 TB constraint checking must instead be a declarative batch
    * job with ONE scan for every row-local check — here all four
    * row-local checks fuse into a single map-side-combinable aggregate
    * (plan-gated in [[DqChecksSpec]]) — plus one anti-join per
    * referential check with the dimension side broadcast.
    *
    * The validated batch is `orders` plus a crafted bad batch (negative
    * keys, so it cannot collide) carrying exactly one violation of each
    * kind; the oracle replays the same UNION ALL, so every check is
    * exercised with n_violations > 0 rather than vacuously green. */
  val dqChecks: Op = Op(
    "q_dq_checks",
    """WITH batch AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
      |  UNION ALL SELECT -1, NULL, 'O', 100.0
      |  UNION ALL SELECT -2, 1, 'X', 100.0
      |  UNION ALL SELECT -3, 1, 'O', -50.0
      |  UNION ALL SELECT -4, 1, 'O', 100.0
      |  UNION ALL SELECT -4, 1, 'O', 100.0
      |  UNION ALL SELECT -5, -999999, 'O', 100.0
      |), rowlocal AS (
      |  SELECT COUNT(*) AS n_rows,
      |         COUNT(*) FILTER (WHERE o_custkey IS NULL) AS n_null_cust,
      |         COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')) AS n_bad_status,
      |         COUNT(*) FILTER (WHERE o_totalprice <= 0) AS n_nonpos,
      |         COUNT(DISTINCT o_orderkey) AS n_distinct_pk,
      |         COUNT(o_custkey) AS n_custkey
      |  FROM batch
      |), orphan AS (
      |  SELECT COUNT(*) AS n FROM batch b
      |  WHERE b.o_custkey IS NOT NULL
      |    AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = b.o_custkey)
      |)
      |SELECT 'null_custkey' AS check_name, n_null_cust AS n_violations,
      |       n_rows AS n_checked, n_null_cust = 0 AS passed FROM rowlocal
      |UNION ALL
      |SELECT 'invalid_status', n_bad_status, n_rows, n_bad_status = 0 FROM rowlocal
      |UNION ALL
      |SELECT 'nonpositive_totalprice', n_nonpos, n_rows, n_nonpos = 0 FROM rowlocal
      |UNION ALL
      |SELECT 'duplicate_orderkey', n_rows - n_distinct_pk, n_rows,
      |       n_rows = n_distinct_pk FROM rowlocal
      |UNION ALL
      |SELECT 'fk_orphan_custkey', orphan.n, rowlocal.n_custkey, orphan.n = 0
      |FROM orphan, rowlocal""".stripMargin) { (spark, dir) =>
    val batch = dqBatch(spark, dir)
    val rl = batch.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("o_custkey").isNull, 1)).as("n_null_cust"),
      count(when(!col("o_orderstatus").isin("O", "F", "P"), 1))
        .as("n_bad_status"),
      count(when(col("o_totalprice") <= 0, 1)).as("n_nonpos"),
      countDistinct(col("o_orderkey")).as("n_distinct_pk"),
      count(col("o_custkey")).as("n_custkey"))
    val orphans = batch
      .filter(col("o_custkey").isNotNull)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    // ONE stats row (row-local aggregate × broadcast orphan count),
    // exploded into the five verdict rows — the batch is scanned once
    // for every row-local check and once for the referential one,
    // never per check
    def v(name: String, viol: org.apache.spark.sql.Column,
        checked: org.apache.spark.sql.Column) =
      struct(lit(name).as("check_name"), viol.as("n_violations"),
        checked.as("n_checked"))
    rl.crossJoin(broadcast(orphans))
      .select(explode(array(
        v("null_custkey", col("n_null_cust"), col("n_rows")),
        v("invalid_status", col("n_bad_status"), col("n_rows")),
        v("nonpositive_totalprice", col("n_nonpos"), col("n_rows")),
        v("duplicate_orderkey",
          col("n_rows") - col("n_distinct_pk"), col("n_rows")),
        v("fk_orphan_custkey", col("n_orphans"), col("n_custkey"))))
        .as("c"))
      .select(col("c.check_name").as("check_name"),
        col("c.n_violations").as("n_violations"),
        col("c.n_checked").as("n_checked"),
        (col("c.n_violations") === 0).as("passed"))
  }

  /** The validated batch: `orders` + the crafted bad batch (one
    * violation of each kind, negative keys so they cannot collide). */
  private[operators] def dqBatch(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    // one LocalRelation, not six single-row unions: Catalyst pushes the
    // referential anti-join into every union branch, so per-row frames
    // would each re-probe the dimension table
    val bad = Seq(
      (-1L, None: Option[Long], "O", 100.0),
      (-2L, Some(1L), "X", 100.0),
      (-3L, Some(1L), "O", -50.0),
      (-4L, Some(1L), "O", 100.0),
      (-4L, Some(1L), "O", 100.0),
      (-5L, Some(-999999L), "O", 100.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      .union(bad)
  }

  /** Scaled-frequency drift statistic over hashed feature buckets. */
  val DriftScale = 1000000L

  /** Drift flags above this scaled-χ² mass (empirically an order of
    * magnitude over the homogeneous corpus' sampling noise; the spec
    * pins both sides — the corpus splits stay under it, a crafted
    * vocabulary shift goes far over). */
  val DriftThreshold = 200000L

  /** Two-sample drift kernel over (bucket, cnt) frames: per bucket the
    * DriftScale-scaled frequencies `fa = (S·a) div n`, `fb = (S·b) div
    * m`, contribution `(fa−fb)² div (fa+fb+2)` — the χ²-shaped
    * statistic on SCALED INTEGER frequencies (exact floor division
    * everywhere: the textbook χ² denominator n·m·(aᵢ+bᵢ) overflows
    * int64 at corpus scale, and ln-based divergences (PSI, KL) have no
    * cross-engine bit guarantee; this form is monotone in the same
    * discrepancies and engine-exact). Missing buckets count as zero on
    * their side via the full outer join. */
  private[graft] def driftStat(a: DataFrame, b: DataFrame): DataFrame = {
    val na = a.agg(sum(col("cnt")).as("n"))
    val nb = b.agg(sum(col("cnt")).as("m"))
    a.select(col("bucket"), col("cnt").as("a"))
      .join(b.select(col("bucket"), col("cnt").as("b")), Seq("bucket"),
        "full_outer")
      .na.fill(0L, Seq("a", "b"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(expr(s"($DriftScale * a) div n").as("fa"),
        expr(s"($DriftScale * b) div m").as("fb"))
      .select(expr("((fa - fb) * (fa - fb)) div (fa + fb + 2)").as("c"))
      .agg(sum(col("c")).as("chi2_scaled"))
  }

  /** Distribution-drift monitor — the data-quality check [[dqChecks]]
    * does not cover: constraints can all hold while the CONTENT
    * distribution silently moves (new domain mix, tokenizer change,
    * upstream filter bug). Feature space is hashed word bigrams
    * ([[TextOps.bigramArray]] → rolling hash → [[Retrieval.DsirDim]]
    * buckets — the DSIR feature device, so the model stays O(512)
    * regardless of corpus size); two natural splits are monitored:
    * arrival halves (early vs late doc_id — ingestion drift) and the
    * dominant language vs the rest (mix drift). On this homogeneous
    * corpus both stay under [[DriftThreshold]] — the FLAG's firing
    * side is pinned by the spec's crafted vocabulary shift, the
    * statistic itself by the oracle.
    *
    * Scale shape: one map-combinable (split-tag, bucket) count per
    * comparison reduces the token stream; everything after is
    * 512-row arithmetic. */
  val driftMonitor: Op = Op(
    "q_drift_chi2",
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |         regexp_extract_all(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '[a-z]+') AS w,
       |         (SELECT max(doc_id) FROM documents) AS mx
       |  FROM documents
       |), b AS (
       |  SELECT doc_id, lang, mx,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(w[i] || ' ' || w[i+1], ''),
       |        c -> CAST(ascii(c) AS BIGINT))),
       |      (acc, x) -> (acc * 31 + x) % 1000000007)
       |      % ${Retrieval.DsirDim} AS bucket
       |  FROM t, unnest(range(1, len(w))) AS x(i)
       |), cmp AS (
       |  SELECT 'arrival_halves' AS split,
       |         doc_id * 2 <= mx AS in_a, bucket FROM b
       |  UNION ALL
       |  SELECT 'lang_mix', lang = '${Retrieval.DsirTargetLang}', bucket FROM b
       |), c AS (
       |  SELECT split, in_a, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM cmp GROUP BY 1, 2, 3
       |), tot AS (
       |  SELECT split, in_a, CAST(SUM(cnt) AS BIGINT) AS t
       |  FROM c GROUP BY 1, 2
       |), f AS (
       |  SELECT COALESCE(ca.split, cb.split) AS split,
       |         ($DriftScale * COALESCE(ca.cnt, 0)) // ta.t AS fa,
       |         ($DriftScale * COALESCE(cb.cnt, 0)) // tb.t AS fb
       |  FROM (SELECT * FROM c WHERE in_a) ca
       |  FULL JOIN (SELECT * FROM c WHERE NOT in_a) cb
       |    ON ca.split = cb.split AND ca.bucket = cb.bucket
       |  JOIN tot ta ON ta.split = COALESCE(ca.split, cb.split) AND ta.in_a
       |  JOIN tot tb ON tb.split = COALESCE(ca.split, cb.split) AND NOT tb.in_a
       |)
       |SELECT split,
       |       CAST(SUM(((fa - fb) * (fa - fb)) // (fa + fb + 2)) AS BIGINT)
       |         AS chi2_scaled,
       |       SUM(((fa - fb) * (fa - fb)) // (fa + fb + 2)) > $DriftThreshold
       |         AS drifted
       |FROM f GROUP BY 1""".stripMargin) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val mx = docs.agg(max(col("doc_id")).as("mx"))
    // r14: ride the session-cached DSIR (doc_id, tgt, bucket, cnt)
    // frame — IDENTICAL tokenizer ([[TextOps.bigramArray]]), identical
    // fingerprint-mod bucket law, identical target-lang flag — instead
    // of re-tokenizing the corpus (the former `rows` subtree sat under
    // BOTH legs of the split union, so the op tokenized the corpus
    // TWICE per run). Both splits now reduce from ONE tiny
    // (bucket, arrival_half, tgt) rollup of the cached counts; `mx`
    // still comes from the documents scan (a doc with < 2 words has no
    // bigram row, so max(doc_id) over dc could differ).
    val dc = Retrieval.dsirDocCountsCached(spark, dir)
    val c0 = dc.crossJoin(broadcast(mx))
      .groupBy(col("bucket"),
        (col("doc_id") * 2 <= col("mx")).as("arr_a"), col("tgt"))
      .agg(sum(col("cnt")).as("cnt"))
      .localCheckpoint()
    val c = c0.select(lit("arrival_halves").as("split"),
        col("arr_a").as("in_a"), col("bucket"), col("cnt"))
      .unionByName(c0.select(lit("lang_mix").as("split"),
        col("tgt").as("in_a"), col("bucket"), col("cnt")))
      .groupBy(col("split"), col("in_a"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val tot = c.groupBy(col("split"), col("in_a"))
      .agg(sum(col("cnt")).as("t"))
    val ta = tot.filter(col("in_a")).select(col("split"), col("t").as("na"))
    val tb = tot.filter(!col("in_a")).select(col("split"), col("t").as("nb"))
    val ca = c.filter(col("in_a"))
      .select(col("split"), col("bucket"), col("cnt").as("a"))
    val cb = c.filter(!col("in_a"))
      .select(col("split"), col("bucket"), col("cnt").as("b"))
    ca.join(cb, Seq("split", "bucket"), "full_outer")
      .na.fill(0L, Seq("a", "b"))
      .join(broadcast(ta), Seq("split"))
      .join(broadcast(tb), Seq("split"))
      .select(col("split"),
        expr(s"($DriftScale * a) div na").as("fa"),
        expr(s"($DriftScale * b) div nb").as("fb"))
      .groupBy(col("split"))
      .agg(sum(expr("((fa - fb) * (fa - fb)) div (fa + fb + 2)"))
        .as("chi2_scaled"))
      .select(col("split"), col("chi2_scaled"),
        (col("chi2_scaled") > DriftThreshold).as("drifted"))
  }
}
