package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer induction and application — the
  * tokenizer-training mile of the LLM data pipeline (Sennrich et al.,
  * ACL 2016: learn subword merges by iterated most-frequent-adjacent-
  * pair counting over the WORD-FREQUENCY table, not the corpus).
  *
  * Scale shape: the corpus is scanned ONCE (a word-count aggregate with
  * map-side combine); every merge round after that touches only the
  * word-TYPE table, which Heaps' law keeps sublinear in corpus size
  * (and which a closed vocabulary saturates outright — the fixture
  * measures exactly that). Per round: one pair-count aggregate over
  * the types (partial agg, then a k=1 `TakeOrderedAndProject` argmax —
  * never a global sort) and one map-only greedy merge fold; each round
  * is `localCheckpoint`ed like [[GraphOps.connectedComponents]]'
  * iterates so lineage stays flat. The merge table itself is O(rounds)
  * metadata — the tokenizer artifact — and PERSISTS at rest
  * ([[PersistedStore]] `bpe_merges`, ninth+1 store): train once next
  * to the corpus, every encoder (a new session, another process, the
  * delta path) reads the artifact, exactly the
  * write_index/read_index contract the PQ store set.
  *
  * Greedy-merge law (pinned against a plain-Scala reference in
  * BpeSpec): within one round the chosen pair (a, b) merges left to
  * right, a just-merged token never re-merges (for a run "aaaa" with
  * pair (a,a): [aa, aa], for "aaa": [aa, a]); ties in pair counts
  * break by (count DESC, a ASC, b ASC) — both engines compare strings
  * by binary UTF-8 order, so the tie order agrees for any symbol
  * surface. The DuckDB oracle replays
  * the SAME iterated argmax+merge relationally (lead/lag windows with
  * run-parity selection — greedy ≡ "merge every even-offset match
  * inside each maximal run", the gaps-and-islands form), so the green
  * row proves the distributed fold against an independent
  * formulation.
  *
  * Reference behavior (tokenizer-adjacent counting):
  * `/root/reference/scripts/pricing/01_import_pricecharting_csv.js:190-236`
  * normalizes and re-counts text fields row by row per import run;
  * the induction here is the published BPE algorithm, re-expressed
  * Spark-first.
  */
object Bpe {

  /** Merge rounds for the registered ops (a real tokenizer runs
    * 30k–100k rounds; the LAW is round-count-agnostic and each round
    * is one tiny aggregate — 8 keeps the bench honest while the spec
    * pins deeper runs, to 256 merges, on fixtures). */
  val NumMerges = 8

  /** The token surface — the SAME law the curation/packing kernels
    * tokenize with ([[graft.functions.TextAnalysis.BpeishRe]]: letter
    * runs, digit runs, single punctuation; case-preserving): the
    * tokenizer trains and encodes over the full surface the pipeline
    * budgets by, so digits and punctuation are in-vocab instead of
    * flooding `unk` — the two token laws meet. */
  val TokenRe: String = graft.functions.TextAnalysis.BpeishRe

  /** End-of-word marker symbol: a single space. Tokens are
    * [[TokenRe]] matches, which exclude ALL whitespace, so the marker
    * is outside the alphabet by construction (`_` no longer is — the
    * widened surface contains it as punctuation) and word-final
    * merges stay distinguishable, as in the published algorithm's
    * </w>. */
  val Marker = " "

  /** Geometry of the registered FULL-BATCH (approximate) induction —
    * rounds × top-k under the one-hop domination rule (see
    * [[trainFullBatch]]). Three rounds keep the oracle replay at three
    * CTE generations while still exercising multi-accept rounds on the
    * real corpus. */
  val ParallelRounds = 3
  val ParallelTopK = 8

  /** Word-frequency table over (text) rows: [[TokenRe]] word types
    * with corpus multiplicity. One corpus pass, map-side
    * combinable. */
  private[graft] def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(regexp_extract_all(col("text"),
        lit(TokenRe), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Initial symbol array of a word: its characters plus [[Marker]]. */
  private[graft] def initSyms(w: Column): Column =
    concat(transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
      array(lit(Marker)))

  /** One greedy left-to-right merge of adjacent (a, b) in a symbol
    * array — the fold form: a just-merged symbol (a||b, never equal to
    * a since b is non-empty) cannot re-merge as the left of the same
    * pair, which is exactly the published algorithm's in-place scan. */
  private[graft] def mergePair(syms: Column, a: Column, b: Column)
      : Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(size(acc) > 0 &&
          element_at(acc, -1) === a && s === b,
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(element_at(acc, -1), s))))
        .otherwise(concat(acc, array(s))))

  /** The whole merge table as ONE map value — `map<(a, b), rank>` in
    * a single-row frame. Cross-join (broadcast) this into any frame
    * and encode with [[encodeFixpoint]]: the merge table enters the
    * plan as DATA (one MapData literal per task via the broadcast),
    * never as operators, so plan/expression size is O(1) in merge
    * count — the fix for the per-merge `foldLeft` chain whose
    * expression tree grew with vocab size (unanalyzable at a
    * production 30k merges). Keys are `a \t b` strings: tokens are
    * [[TokenRe]] matches (whitespace-free) and the marker is ' ', so
    * a tab can never occur inside a symbol and the key is
    * collision-free — and map probes compare flat UTF-8 bytes
    * (measured ~20× faster than struct keys, whose GetMapValue probe
    * goes through interpreted struct ordering per entry). */
  private[graft] val KeySep = "\t"

  private[graft] def mergeRankMap(merges: DataFrame): DataFrame =
    merges.agg(
      map_from_entries(collect_list(struct(
        concat_ws(KeySep, col("left_sym"), col("right_sym")).as("k"),
        col("merge_rank").as("v")))).as("mrank"))

  /** Bucket count of the BUCKETED rank map — sized so a production
    * 30k–100k-merge table averages a few dozen entries per bucket. */
  val MapBuckets = 1024

  /** [[mergeRankMap]]'s PRODUCTION-DEPTH sibling: `element_at` on a
    * Spark map is a linear scan over ALL entries, so the flat map's
    * per-lookup cost grows with vocab size — fine at the registered
    * depth 8, measurable at 256, prohibitive at 30k. The bucketed
    * form keys a map<long, array<entry>> by `xxhash64(key) mod
    * [[MapBuckets]]`: a probe scans at most min(N, 1024) LONG keys
    * (flat 8-byte compares) plus one tiny bucket array instead of N
    * string compares. Measured (BpeEncodeBench, PERF.md round 9):
    * 2.9× faster than the flat map already at depth 256 and 17× at a
    * synthetic depth 4096, so this is the DEFAULT for every encode
    * path; same law, spec-pinned ≡ flat. */
  /** The shared bucketed-one-row-map BUILDER: any (k string, v) frame
    * becomes one `map<long, array<struct<k, v>>>` row keyed by
    * `xxhash64(k) mod [[MapBuckets]]` under `outName`. One device,
    * two instances (merge ranks, token-id inventory) — a change to the
    * bucketing law lands once. */
  private def bucketedMapOf(kv: DataFrame, outName: String): DataFrame =
    kv.groupBy(pmod(xxhash64(col("k")), lit(MapBuckets.toLong))
        .as("bucket"))
      .agg(collect_list(struct(col("k"), col("v"))).as("entries"))
      .agg(map_from_entries(collect_list(
        struct(col("bucket"), col("entries")))).as(outName))

  /** The shared PROBE of a [[bucketedMapOf]] map column: hash to the
    * bucket, scan its entry slice, take the first key match
    * (try_element_at: a miss filters to an empty slice → null).
    * `entryType` is the bucket array's SQL type — the value type
    * differs per instance (int ranks, bigint ids). */
  private def bucketedProbe(bmap: Column, key: Column,
      entryType: String): Column =
    try_element_at(
      filter(
        coalesce(
          element_at(bmap, pmod(xxhash64(key), lit(MapBuckets.toLong))),
          array().cast(entryType)),
        e => e.getField("k") === key),
      lit(1)).getField("v")

  private[graft] def mergeRankMapBucketed(merges: DataFrame): DataFrame =
    bucketedMapOf(
      merges.select(
        concat_ws(KeySep, col("left_sym"), col("right_sym")).as("k"),
        col("merge_rank").as("v")),
      "mrank")

  /** Rank lookup through a [[mergeRankMapBucketed]] map column. */
  private def bucketedRank(bmap: Column, key: Column): Column =
    bucketedProbe(bmap, key, "array<struct<k:string,v:int>>")

  /** The token-id INVENTORY as a bucketed one-row map — the same
    * device as [[mergeRankMapBucketed]], for the symbol→id probe: a
    * flat string-keyed map pays a linear `element_at` scan per lookup,
    * which at a production 30k-symbol inventory is exactly the defect
    * class the bucketed merge map closed (measured: flat is linear in
    * inventory size, 20× slower at 32k symbols — PERF.md round 10).
    * Input is [[inventoryIds]]' (sym, id). Default on the batch token
    * emitter AND the streaming tokens leg (BpeSpec pins bucketed ≡
    * flat, hits and misses). */
  private[graft] def inventoryMapBucketed(inv: DataFrame): DataFrame =
    bucketedMapOf(
      inv.select(col("sym").as("k"), col("id").as("v")), "imap")

  /** Id lookup through an [[inventoryMapBucketed]] map column; a miss
    * (symbol outside the inventory) is unk = 0 — the batch op's
    * left-join coalesce, row-local. */
  private[graft] def bucketedSymId(bmap: Column, key: Column): Column =
    coalesce(
      bucketedProbe(bmap, key, "array<struct<k:string,v:bigint>>"),
      lit(0L))

  /** Canonical BPE ENCODE as one bounded-fixpoint expression — the
    * published application algorithm (Sennrich et al. 2016 §2.2 /
    * subword-nmt `encode`): repeatedly find the adjacent pair with
    * the LOWEST merge rank present in the table and merge all its
    * occurrences greedily left-to-right, until no adjacent pair is in
    * the table. `mrank` is [[mergeRankMap]]'s map column.
    *
    * The loop rides `aggregate` over `sequence(1, |syms|-1)`: every
    * productive iteration shrinks the symbol array by ≥ 1, so
    * |initial syms| - 1 iterations ALWAYS reach the fixpoint and the
    * spent iterations after it are no-ops (null best-rank ⇒ identity).
    * Plan size is O(1) in BOTH merge count and word length — per-word
    * work is O(len² · lookup), all inside codegen'd HOFs.
    *
    * Note this is the rank-priority FIXPOINT law, not "apply merge 1
    * everywhere, then merge 2, …": the two differ exactly when a
    * later merge's output resurrects an earlier-ranked pair (possible
    * only for symbols derivable by two distinct merge paths); the
    * fixpoint form is what published encoders implement, and the
    * DuckDB oracle replays it as a recursive CTE. */
  private[graft] def encodeFixpoint(syms: Column, mrank: Column)
      : Column =
    encodeFixpointWith(syms, k => element_at(mrank, k))

  /** [[encodeFixpoint]] against the bucketed map — the
    * production-depth lookup ([[mergeRankMapBucketed]]). */
  private[graft] def encodeFixpointBucketed(syms: Column, bmap: Column)
      : Column =
    encodeFixpointWith(syms, k => bucketedRank(bmap, k))

  private def encodeFixpointWith(syms: Column,
      lookup: Column => Column): Column =
    aggregate(
      sequence(lit(1), greatest(size(syms) - 1, lit(1))),
      struct(lit(false).as("done"), syms.as("syms")),
      (acc, _) => {
        val cur = acc.getField("syms")
        val ranks = zip_with(
          slice(cur, lit(1), size(cur) - 1),
          slice(cur, lit(2), size(cur) - 1),
          (x, y) => lookup(concat(x, lit(KeySep), y)))
        val br = array_min(ranks)
        val idx = array_position(ranks, br).cast("int")
        // bind (br, a, b) ONCE per iteration through a one-element
        // transform: mergePair's fold evaluates its pair argument per
        // SYMBOL, so inlining the rank-scan expressions there would
        // re-run the whole adjacent-pair lookup for every element —
        // measured 10× slower at depth 256 (BpeEncodeBench). The
        // `done` flag short-circuits the iterations past the fixpoint
        // (the loop bound is |syms|-1, the worst case; most types fix
        // in a few merges), and CASE WHEN's lazy branches make those
        // iterations O(1).
        val bound = array(struct(br.as("br"),
          element_at(cur, idx).as("a"),
          element_at(cur, idx + 1).as("b")))
        when(acc.getField("done"), acc).otherwise(
          element_at(transform(bound, m =>
            when(m.getField("br").isNull,
              struct(lit(true).as("done"), cur.as("syms")))
              .otherwise(struct(lit(false).as("done"),
                mergePair(cur, m.getField("a"), m.getField("b"))
                  .as("syms")))), 1))
      },
      acc => acc.getField("syms"))

  /** Per-word-TYPE segmentation of `docWords`' distinct words under a
    * merge table: (w, syms) — the shared kernel of the encode family
    * (one fixpoint evaluation per TYPE, broadcast back to the
    * data-scaled word stream). */
  private[graft] def typeSegments(docWords: DataFrame, merges: DataFrame,
      bucketed: Boolean = true): DataFrame = {
    val (rankMap, enc) =
      if (bucketed) (mergeRankMapBucketed(merges), encodeFixpointBucketed _)
      else (mergeRankMap(merges), encodeFixpoint _)
    docWords.select(col("w")).distinct()
      .crossJoin(broadcast(rankMap))
      .select(col("w"),
        enc(initSyms(col("w")), col("mrank")).as("syms"))
  }

  /** Adjacent-pair counts over a (w, freq, syms) vocab — weighted by
    * word frequency; the per-round aggregate. */
  private[operators] def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("freq"), explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** BPE induction over (text) rows: the merge table
    * (merge_rank, left_sym, right_sym, pair_count), rank 1..numMerges
    * (fewer iff the pair space exhausts first). The loop is
    * driver-steered but every step is distributed: argmax rides a
    * 1-row `TakeOrderedAndProject`, the winning pair re-enters the
    * plan via a broadcast cross join (1 row — never a collected
    * data-scaled value), and each round's vocab is checkpointed so
    * round r+1's lineage starts flat. */
  def train(docs: DataFrame, numMerges: Int = NumMerges): DataFrame = {
    val (m, v) = trainWithVocab(docs, numMerges)
    SessionCache.releaseFrame(v)
    m
  }

  /** BATCHED induction — the production job-cadence fix for the
    * driver-steered round loop (a real tokenizer is 30k–100k merges;
    * at ~2 Spark jobs per merge that is a six-figure sequential job
    * storm; this variant spends the same 2 jobs per ROUND and commits
    * up to `batch` merges each round), PROVABLY equivalent to
    * sequential greedy — not an approximation. The accepted batch is
    * the maximal ranked prefix (cnt DESC, a, b — the sequential
    * order) that is
    *
    *  (1) pairwise symbol-disjoint (stop at the FIRST pair sharing a
    *      symbol with an earlier accept — skipping would diverge), and
    *  (2) strictly above the cutoff `t` = the count of that first
    *      stopped pair: accepted counts must be > t.
    *
    * Why that equals sequential greedy, merge for merge: disjoint
    * merges commute and cannot overlap in any occurrence, so counts of
    * accepted pairs are untouched by earlier batch members; every pair
    * AFFECTED by an accepted merge (shares a symbol) ranks at or below
    * the stopped pair, so its (only ever decreasing) count stays ≤ t;
    * and every pair CREATED by an accepted merge (x·ab or ab·y)
    * inherits ≤ its parent pair's count — the parent shares a symbol,
    * so ≤ t as well. With every accepted count > t, the sequential
    * argmax at inner step i is exactly batch member i. The head pair
    * is always accepted alone if the cutoff bites immediately (batch
    * of 1 ≡ one sequential step), so progress is guaranteed and the
    * merge table — ranks, symbols, recorded counts — is IDENTICAL to
    * [[train]]'s (BpeSpec pins batched ≡ the plain-Scala sequential
    * reference at several batch sizes, plus batched ≡ [[train]] on
    * real data).
    *
    * Per round: one (batch+1)-row `TakeOrderedAndProject` argmax (the
    * collected rows are O(batch) metadata, same adjudication as the
    * 8-row merge-table reads), then ONE map-only fold applying the
    * whole batch in rank order, then the round checkpoint.
    *
    * `onRound` observes (round, acceptedMerges) after each committed
    * round — telemetry only (the BpeTrainBench occupancy measurement);
    * the default is a no-op and the merge table is unaffected. */
  def trainBatched(docs: DataFrame, numMerges: Int = NumMerges,
      batch: Int = 32,
      onRound: (Int, Int) => Unit = (_, _) => ()): DataFrame = {
    var vocab = wordFreqs(docs)
      .withColumn("syms", initSyms(col("w")))
      .select(col("w"), col("freq"), col("syms"))
      .localCheckpoint()
    var merges: Option[DataFrame] = None
    var done = 0
    var round = 0
    var exhausted = false
    while (done < numMerges && !exhausted) {
      val want = math.min(batch, numMerges - done)
      val top = pairCounts(vocab)
        .orderBy(desc("cnt"), asc("a"), asc("b")).limit(want + 1)
        .collect() // O(batch) rows — bounded metadata, never data-scaled
      if (top.isEmpty) exhausted = true
      else {
        // maximal disjoint prefix + strict cutoff (see scaladoc)
        val used = scala.collection.mutable.Set.empty[String]
        val prefix = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        var stoppedCnt = 0L // count of the first conflicted/overflow pair
        var i = 0
        var stopped = false
        while (i < top.length && !stopped && prefix.size < want) {
          val (a, b, c) = (top(i).getAs[String]("a"),
            top(i).getAs[String]("b"), top(i).getAs[Long]("cnt"))
          if (used.contains(a) || used.contains(b)) {
            stopped = true; stoppedCnt = c
          } else {
            prefix += ((a, b, c)); used += a; used += b; i += 1
          }
        }
        // the (want+1)-th row (if present) is also a cutoff witness:
        // pairs beyond the window could tie with the accepted tail
        if (!stopped && i < top.length)
          stoppedCnt = top(i).getAs[Long]("cnt")
        val safe = prefix.takeWhile(_._3 > stoppedCnt)
        val accepted =
          if (safe.nonEmpty) safe.toSeq
          else Seq(prefix.head) // head alone ≡ one sequential step
        val rows = accepted.zipWithIndex.map { case ((a, b, c), j) =>
          (done + j + 1, a, b, c)
        }
        val sess = vocab.sparkSession
        import sess.implicits._
        val batchDf = rows.toDF(
          "merge_rank", "left_sym", "right_sym", "pair_count")
          .select(col("merge_rank").cast("int"), col("left_sym"),
            col("right_sym"), col("pair_count"))
        merges = Some(merges.fold(batchDf)(_.union(batchDf)))
        // bound the union tree: at production round counts (30k merges
        // ≈ 1k rounds) an unbounded union would make the final
        // checkpoint replan a 1k-branch tree; collapse every 64 ROUNDS
        // (keyed on the round counter — partial-batch accepts make
        // `done` advance by ~2.5/round, so a done-keyed condition both
        // under-fires and re-fires; the merge table is O(done)
        // metadata, the checkpoint is tiny)
        if (round % 64 == 63)
          merges = merges.map(_.localCheckpoint())
        val old = vocab
        val foldedSyms = accepted.foldLeft(col("syms")) {
          case (c, (a, b, _)) => mergePair(c, lit(a), lit(b))
        }
        vocab = vocab.withColumn("syms", foldedSyms)
          .select(col("w"), col("freq"), col("syms"))
          .localCheckpoint()
        SessionCache.releaseFrame(old)
        done += accepted.size
        round += 1
        onRound(round, accepted.size)
      }
    }
    val out = merges.getOrElse(
      vocab.sparkSession.emptyDataFrame
        .select(lit(0).as("merge_rank"), lit("").as("left_sym"),
          lit("").as("right_sym"), lit(0L).as("pair_count"))
        .limit(0)).localCheckpoint()
    SessionCache.releaseFrame(vocab)
    out
  }

  /** FULL-BATCH induction — the APPROXIMATE production cadence
    * (explicitly NOT greedy-equivalent, unlike [[trainBatched]]): per
    * round take the top-`k` pairs in sequential order (cnt DESC, a, b)
    * and accept every pair with NO higher-ranked top-k pair sharing a
    * symbol (one-hop domination — a pure relational predicate, no scan
    * state), then apply the whole accepted set at once.
    *
    * Properties that make this an honest engine op rather than a
    * heuristic: the accepted set is pairwise symbol-disjoint (if two
    * accepted pairs shared a symbol, the later-ranked one would be
    * dominated by the earlier), so the rank-order fold ≡ simultaneous
    * application — and no in-round interaction is even possible,
    * because a pair involving a symbol CREATED this round cannot exist
    * at round start (the string "ab" exists only after (a, b) merged,
    * at which point (a, b) adjacency is extinct; merges concatenate
    * and never split, so dead adjacencies cannot re-form). Hence the
    * merge table is a deterministic function of the corpus and
    * (rounds, k), and the DuckDB oracle replays the SAME law
    * ([[oracleInductionParallel]]): ranked window → anti-join
    * domination → ONE simultaneous gaps-and-islands merge pass.
    *
    * What it trades: counts are NOT recounted between in-round
    * accepts, so a lower-ranked accept may beat a pair whose count
    * would have grown — the standard parallel-BPE approximation. The
    * exact-equivalent [[trainBatched]] measured occupancy ~2.5 on an
    * open-vocab corpus (Zipf symbol-head conflicts bound the strict
    * cutoff — PERF.md round-8); this form exists for the 30k-merge
    * cadence where ~k merges per 2-job round matter more than
    * merge-for-merge greedy parity, with the approximation MEASURED,
    * not waved at (BpeSpec pins k = 1 degenerates to exact greedy and
    * the engine ≡ a plain-Scala reference of the law; PERF reports
    * realized occupancy and merge-set overlap vs sequential greedy on
    * the open-vocab corpus).
    *
    * `maxMerges` bounds the table for bench comparisons; the
    * registered op runs exactly [[ParallelRounds]] rounds (the oracle
    * is a static CTE chain). */
  def trainFullBatch(docs: DataFrame, rounds: Int = ParallelRounds,
      k: Int = ParallelTopK, maxMerges: Int = Int.MaxValue,
      onRound: (Int, Int) => Unit = (_, _) => ()): DataFrame = {
    var vocab = wordFreqs(docs)
      .withColumn("syms", initSyms(col("w")))
      .select(col("w"), col("freq"), col("syms"))
      .localCheckpoint()
    var merges: Option[DataFrame] = None
    var done = 0
    var round = 0
    var exhausted = false
    while (round < rounds && done < maxMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(desc("cnt"), asc("a"), asc("b")).limit(k)
        .collect() // O(k) rows — bounded metadata, never data-scaled
      if (top.isEmpty) exhausted = true
      else {
        val ranked = top.map(r => (r.getAs[String]("a"),
          r.getAs[String]("b"), r.getAs[Long]("cnt")))
        // one-hop domination: accepted iff no higher-RANKED top-k row
        // (accepted or not) shares a symbol — the NOT EXISTS the
        // oracle replays verbatim
        val accepted = ranked.zipWithIndex.collect {
          case ((a, b, c), i) if !ranked.take(i).exists { case (x, y, _) =>
            x == a || x == b || y == a || y == b } => (a, b, c)
        }.toSeq
        val rows = accepted.zipWithIndex.map { case ((a, b, c), j) =>
          (done + j + 1, a, b, c)
        }
        val sess = vocab.sparkSession
        import sess.implicits._
        val batchDf = rows.toDF(
          "merge_rank", "left_sym", "right_sym", "pair_count")
          .select(col("merge_rank").cast("int"), col("left_sym"),
            col("right_sym"), col("pair_count"))
        merges = Some(merges.fold(batchDf)(_.union(batchDf)))
        if (round % 64 == 63) merges = merges.map(_.localCheckpoint())
        val old = vocab
        val foldedSyms = accepted.foldLeft(col("syms")) {
          case (c, (a, b, _)) => mergePair(c, lit(a), lit(b))
        }
        vocab = vocab.withColumn("syms", foldedSyms)
          .select(col("w"), col("freq"), col("syms"))
          .localCheckpoint()
        SessionCache.releaseFrame(old)
        done += accepted.size
        round += 1
        onRound(round, accepted.size)
      }
    }
    val out = merges.getOrElse(
      vocab.sparkSession.emptyDataFrame
        .select(lit(0).as("merge_rank"), lit("").as("left_sym"),
          lit("").as("right_sym"), lit(0L).as("pair_count"))
        .limit(0)).localCheckpoint()
    SessionCache.releaseFrame(vocab)
    out
  }

  /** [[train]] plus the FINAL segmented vocab (w, freq, syms) — the
    * other half of the tokenizer artifact (merges drive encoding of
    * unseen text; the segmented vocab is the subword inventory and the
    * fast path for seen types). Caller owns the vocab frame's
    * checkpoint blocks. */
  def trainWithVocab(docs: DataFrame, numMerges: Int = NumMerges)
      : (DataFrame, DataFrame) = {
    var vocab = wordFreqs(docs)
      .withColumn("syms", initSyms(col("w")))
      .select(col("w"), col("freq"), col("syms"))
      .localCheckpoint()
    var merges: Option[DataFrame] = None
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val best = pairCounts(vocab)
        .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1)
        .select(lit(r).cast("int").as("merge_rank"),
          col("a").as("left_sym"), col("b").as("right_sym"),
          col("cnt").as("pair_count"))
        .localCheckpoint()
      if (best.isEmpty) exhausted = true
      else {
        merges = Some(merges.fold(best)(_.union(best)))
        val old = vocab
        vocab = vocab
          .crossJoin(broadcast(
            best.select(col("left_sym"), col("right_sym"))))
          .withColumn("syms",
            mergePair(col("syms"), col("left_sym"), col("right_sym")))
          .select(col("w"), col("freq"), col("syms"))
          .localCheckpoint()
        SessionCache.releaseFrame(old)
        r += 1
      }
    }
    (merges.getOrElse(
      vocab.sparkSession.emptyDataFrame
        .select(lit(0).as("merge_rank"), lit("").as("left_sym"),
          lit("").as("right_sym"), lit(0L).as("pair_count"))
        .limit(0)), vocab)
  }

  private val mergesCache = SessionCache.mkFrames()
  private val vocabCache = SessionCache.mkFrames()

  private[graft] def clearMergesCache(): Unit = {
    mergesCache.clear(); vocabCache.clear()
  }

  /** Build-or-reuse the full tokenizer store (merge table + final
    * segmented vocab as sibling parquet dirs under one signature). */
  private def ensureStore(spark: SparkSession, dir: String): String =
    PersistedStore.ensure(spark, dir, "documents.parquet",
      "bpe_merges", "v3") { root => // v3: widened TokenRe surface + ' ' marker
      val (m, v) = trainWithVocab(Tables.documents(spark, dir)
        .filter(col("doc_id") % Dedup.IncrementalDeltaMod =!= 0))
      m.write.mode("overwrite").parquet(s"$root/merges")
      v.write.mode("overwrite").parquet(s"$root/vocab")
      SessionCache.releaseFrame(v)
    }

  /** The STANDING corpus' merge table — session-cached AND at rest
    * ([[PersistedStore]] `bpe_merges`): the tokenizer is yesterday's
    * artifact; an encoder never re-trains. Standing slice =
    * `doc_id % IncrementalDeltaMod != 0`, the same train/delta split
    * the drift monitor and incremental dedup use. */
  private[graft] def standingMerges(spark: SparkSession, dir: String)
      : DataFrame =
    mergesCache.getOrBuild(spark, dir, "documents.parquet") {
      spark.read.parquet(s"${ensureStore(spark, dir)}/merges")
        .localCheckpoint()
    }

  /** The STANDING corpus' final segmented vocab (w, freq, syms) —
    * the store's other half. */
  private[graft] def standingVocab(spark: SparkSession, dir: String)
      : DataFrame =
    vocabCache.getOrBuild(spark, dir, "documents.parquet") {
      spark.read.parquet(s"${ensureStore(spark, dir)}/vocab")
        .localCheckpoint()
    }

  /** The induced merge table as a registered op. */
  val bpeMerges: Op = Op("q_bpe_merges",
    oracleInduction(NumMerges) +
      "\nSELECT * FROM merge_table") { (spark, dir) =>
    standingMerges(spark, dir)
  }

  private val batchedMergesCache = SessionCache.mkFrames()

  private[graft] def clearBatchedMergesCache(): Unit =
    batchedMergesCache.clear()

  /** The BATCHED trainer registered against the SAME oracle as
    * [[bpeMerges]]: [[trainBatched]] is provably equivalent to
    * sequential greedy, so the identical DuckDB induction replay must
    * hash-match — the green row is an independent-engine proof of the
    * batch rule on real data, on every verify run. Session-cached
    * (the artifact contract is [[standingMerges]]'; this op exists to
    * keep the production-cadence path under the correctness gate). */
  val bpeMergesBatched: Op = Op("q_bpe_merges_batched",
    oracleInduction(NumMerges) +
      "\nSELECT * FROM merge_table") { (spark, dir) =>
    batchedMergesCache.getOrBuild(spark, dir, "documents.parquet") {
      trainBatched(Tables.documents(spark, dir)
        .filter(col("doc_id") % Dedup.IncrementalDeltaMod =!= 0),
        NumMerges, batch = 4) // returns checkpointed
    }
  }

  private val parallelMergesCache = SessionCache.mkFrames()

  private[graft] def clearParallelMergesCache(): Unit =
    parallelMergesCache.clear()

  /** The full-batch trainer as a registered op with its OWN oracle —
    * the DuckDB replay of the rounds×top-k one-hop-domination law — so
    * the green row cross-engine-proves the approximate batching rule
    * itself (where [[bpeMergesBatched]] proves exact greedy parity). */
  val bpeMergesParallel: Op = Op("q_bpe_merges_parallel",
    oracleInductionParallel(ParallelRounds, ParallelTopK) +
      "\nSELECT * FROM merge_table") { (spark, dir) =>
    parallelMergesCache.getOrBuild(spark, dir, "documents.parquet") {
      trainFullBatch(Tables.documents(spark, dir)
        .filter(col("doc_id") % Dedup.IncrementalDeltaMod =!= 0))
    }
  }

  /** Merge depth of the DEEP legs — deep enough that the batched
    * trainer commits multi-accept rounds for many generations and the
    * fixpoint encoder probes a non-toy table on EVERY verify run
    * (the registered standing store stays at [[NumMerges]] so the six
    * ops sharing its oracle keep an 8-generation DuckDB replay; the
    * deep oracle is paid by exactly two rows). Spec and bench pin
    * deeper still (256/4096). */
  val DeepMerges = 64

  private val deepMergesCache = SessionCache.mkFrames()

  private[graft] def clearDeepMergesCache(): Unit = deepMergesCache.clear()

  /** The DEEP merge table — trained by [[trainBatched]] (the
    * production job cadence, provably greedy-equivalent) at
    * [[DeepMerges]], persisted at rest like the standing store. */
  private[graft] def deepMerges(spark: SparkSession, dir: String)
      : DataFrame =
    deepMergesCache.getOrBuild(spark, dir, "documents.parquet") {
      val store = PersistedStore.ensure(spark, dir, "documents.parquet",
        "bpe_merges_deep", s"v1:m$DeepMerges") { root =>
        trainBatched(Tables.documents(spark, dir)
          .filter(col("doc_id") % Dedup.IncrementalDeltaMod =!= 0),
          DeepMerges, batch = 32)
          .write.mode("overwrite").parquet(s"$root/merges")
      }
      spark.read.parquet(s"$store/merges").localCheckpoint()
    }

  /** The batched trainer at NON-TOY depth as a registered op — the
    * cross-engine gate for [[trainBatched]] ran at depth 8 while spec
    * and bench proved 256; this row makes every verify run replay a
    * [[DeepMerges]]-generation induction in DuckDB against the
    * engine's multi-accept batched fold (same sequential-greedy
    * oracle as [[bpeMerges]] — the equivalence proof at depth). */
  val bpeMergesDeep: Op = Op("q_bpe_merges_deep",
    oracleInduction(DeepMerges) +
      "\nSELECT * FROM merge_table") { (spark, dir) =>
    deepMerges(spark, dir)
  }

  /** The fixpoint ENCODER at non-toy depth: [[encodeStatsFrom]] (the
    * bucketed-map production path) against the [[DeepMerges]]-deep
    * table on the delta slice — with [[bpeEncode]] this pins that the
    * encode plan really is depth-flat under the correctness gate, not
    * only in the plan spec: same code, same oracle law, 8× the merge
    * table. */
  val bpeEncodeDeep: Op = Op("q_bpe_encode_deep",
    oracleInduction(DeepMerges) + "\n" + oracleEncodeFix +
      "\nSELECT doc_id, n_words, n_chars, n_tokens FROM enc") {
    (spark, dir) =>
      encodeStatsFrom(
        Tables.documents(spark, dir)
          .filter(col("doc_id") % Dedup.IncrementalDeltaMod === 0),
        deepMerges(spark, dir))
  }

  /** The learned subword inventory: every symbol of the final
    * segmented vocab with its corpus occurrence mass (Σ freq over
    * positions) and type spread (distinct words containing it) — the
    * vocabulary file next to the merge table, and the telemetry a
    * tokenizer rollout checks (coverage, dead symbols, marker mass).
    * Pure aggregation over the persisted artifact: explode + one
    * hash aggregate on a type-table-sized frame. */
  val bpeVocab: Op = Op("q_bpe_vocab",
    oracleInduction(NumMerges) +
      s"""
         |SELECT sym,
         |  CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types,
         |  CAST(SUM(freq) AS BIGINT) AS n_occ
         |FROM r$NumMerges GROUP BY sym""".stripMargin) { (spark, dir) =>
    standingVocab(spark, dir)
      .select(col("w"), col("freq"), explode(col("syms")).as("sym"))
      .groupBy(col("sym"))
      .agg(countDistinct(col("w")).as("n_types"),
        sum(col("freq")).as("n_occ"))
      .select(col("sym"), col("n_types"), col("n_occ"))
  }

  /** Apply the standing merge table to the DELTA slice: per-document
    * (n_words, n_chars, n_tokens) under the trained tokenizer — the
    * encode path. The merge table rides in as ONE broadcast map value
    * ([[mergeRankMap]]) and the [[encodeFixpoint]] loop segments the
    * DELTA'S WORD TYPES only; per-document stats come from a broadcast
    * join of the doc→word stream against that tiny type table, so
    * encode cost is corpus-for-the-split + types×len² — and the PLAN
    * is O(1) in merge count (gated in BpePlanSpec): the same code
    * analyzes at 8 merges and at a production 30k. */
  val bpeEncode: Op = Op("q_bpe_encode",
    oracleInduction(NumMerges) + "\n" + oracleEncodeFix +
      "\nSELECT doc_id, n_words, n_chars, n_tokens FROM enc") {
    (spark, dir) => encodeStats(spark, dir)
  }

  /** [[bpeEncode]]'s kernel over any (doc) frame and merge table —
    * shared with the fertility telemetry and the plan gate. */
  private[graft] def encodeStatsFrom(docs: DataFrame, merges: DataFrame,
      bucketed: Boolean = true): DataFrame = {
    val docWords = docs.select(col("doc_id"),
      explode(regexp_extract_all(col("text"),
        lit(TokenRe), lit(0))).as("w"))
    docWords
      .join(broadcast(typeSegments(docWords, merges, bucketed)
        .select(col("w"), size(col("syms")).cast("long").as("n_tok"))),
        Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("long")).as("n_chars"),
        sum(col("n_tok")).as("n_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        col("n_tokens"))
  }

  /** [[encodeStatsFrom]] against the standing artifact, on the delta
    * slice. */
  private[graft] def encodeStats(spark: SparkSession, dir: String)
      : DataFrame =
    encodeStatsFrom(
      Tables.documents(spark, dir)
        .filter(col("doc_id") % Dedup.IncrementalDeltaMod === 0),
      standingMerges(spark, dir))

  /** Tokenizer FERTILITY telemetry over the encoded delta — the
    * rollout health metric a tokenizer team watches per language
    * slice: fertility (tokens per word) spikes on a slice the learned
    * merges don't cover (over-segmentation — higher serving cost per
    * word), and chars-per-token is the compression the vocabulary
    * actually buys there. Both are exact fixed-point PERMILLE via
    * BIGINT floor division over slice-level sums, so the rows are
    * hash-exact cross-engine. Rides [[encodeStats]] (persisted
    * standing merges — never a retrain) + one lang join and a
    * languages-sized aggregate. */
  val bpeFertility: Op = Op("q_bpe_fertility",
    oracleInduction(NumMerges) + "\n" + oracleEncodeFix +
      s"""
         |SELECT d.lang,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(enc.n_words) AS BIGINT) AS n_words,
         |  CAST(SUM(enc.n_tokens) AS BIGINT) AS n_tokens,
         |  (1000 * CAST(SUM(enc.n_tokens) AS BIGINT))
         |    // CAST(SUM(enc.n_words) AS BIGINT) AS fert_permille,
         |  (1000 * CAST(SUM(enc.n_chars) AS BIGINT))
         |    // CAST(SUM(enc.n_tokens) AS BIGINT) AS cpt_permille
         |FROM enc JOIN documents d USING (doc_id)
         |GROUP BY d.lang""".stripMargin) { (spark, dir) =>
    encodeStats(spark, dir)
      .join(Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_tokens")).as("n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        expr("(1000 * n_tokens) div n_words").as("fert_permille"),
        expr("(1000 * n_chars) div n_tokens").as("cpt_permille"))
  }

  /** The DATALOADER artifact itself: per delta document the token-ID
    * sequence under the standing tokenizer — ids assigned by symbol
    * sort order over the STANDING inventory (the final segmented
    * vocab's distinct symbols, 1-based; a delta symbol outside the
    * inventory — possible when later merges consumed every standing
    * occurrence of an early merge's output, or on corpus-new
    * characters — maps to unk=0, and the op reports the unk count as
    * OOV telemetry). The sequence itself is witnessed by an
    * order-sensitive integer fingerprint (the `kept_fp` device: fold
    * 31·acc+id over tokens in document order), so the oracle proves
    * token IDENTITY AND ORDER cross-engine, not just counts — this is
    * `input_ids`, where [[bpeEncode]] is only the token-count stats.
    * Scale shape: the [[encodeFixpoint]] loop touches the delta's
    * word-TYPE table (merge table as ONE broadcast map — plan O(1) in
    * vocab size); symbol→id resolution ALSO lands on the type table
    * (one [[bucketedSymId]] probe per type-symbol through the bucketed
    * inventory map — O(min(N, buckets)) long compares instead of the
    * inventory-linear flat-map scan, and never per occurrence); the
    * doc-order stream then joins ONE broadcast table (type → ids) and
    * folds per doc — one data-scaled shuffle. */
  val bpeTokens: Op = Op("q_bpe_tokens",
    oracleInduction(NumMerges) + "\n" + oracleEncodeFix +
      s""", inv AS (
         |  SELECT sym, row_number() OVER (ORDER BY sym) AS id
         |  FROM (SELECT DISTINCT sym FROM r$NumMerges)
         |), fd AS (
         |  SELECT w, i AS pos, syms[i] AS sym
         |  FROM ffix, unnest(range(1, len(syms) + 1)) AS t(i)
         |), toks AS (
         |  SELECT fdw.doc_id, fdw.w_idx, fd.pos,
         |         CAST(COALESCE(inv.id, 0) AS BIGINT) AS id
         |  FROM fdw JOIN fd ON fdw.w = fd.w
         |  LEFT JOIN inv ON fd.sym = inv.sym
         |)
         |SELECT doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unk,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list(id ORDER BY w_idx, pos)),
         |    (acc, x) -> (acc * 31 + x) % 1000000007) AS ids_fp
         |FROM toks GROUP BY doc_id""".stripMargin) { (spark, dir) =>
    val delta = Tables.documents(spark, dir)
      .filter(col("doc_id") % Dedup.IncrementalDeltaMod === 0)
    val docWords = delta.select(col("doc_id"),
      posexplode(regexp_extract_all(col("text"),
        lit(TokenRe), lit(0))).as(Seq("w_idx", "w")))
    // per-TYPE id resolution: one bucketed-map probe per type symbol,
    // amortized over the bounded type table — the data-scaled word
    // stream only joins the finished (w → ids) table
    val typeIds = typeSegments(docWords, standingMerges(spark, dir))
      .crossJoin(broadcast(inventoryMapBucketed(inventoryIds(spark, dir))))
      .select(col("w"),
        transform(col("syms"), s => bucketedSymId(col("imap"), s))
          .as("ids"))
    docWords
      .join(broadcast(typeIds), Seq("w"))
      .select(col("doc_id"), col("w_idx"),
        posexplode(col("ids")).as(Seq("s_idx", "id")))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("id") === 0L, 1L).otherwise(0L)).as("n_unk"),
        aggregate(
          transform(array_sort(collect_list(
            struct(col("w_idx"), col("s_idx"), col("id")))),
            e => e.getField("id")),
          lit(0L),
          (acc, x) => (acc * 31 + x) % 1000000007L).as("ids_fp"))
      .select(col("doc_id"), col("n_tokens"), col("n_unk"),
        col("ids_fp"))
  }

  /** Fertility per TOKEN CLASS — the rollout telemetry that shows
    * what the widened surface actually buys: letter runs vs digit
    * runs vs punctuation segment differently (merges are learned
    * mostly over letters; digits/punct mostly fall back to characters
    * + marker), and a per-class fertility table is how a tokenizer
    * team sees that before burning compute. Same [[encodeFixpoint]]
    * kernel aggregated over the word stream by class instead of by
    * document; all-BIGINT permilles, hash-exact. */
  val bpeFertilityClass: Op = Op("q_bpe_fertility_class",
    oracleInduction(NumMerges) + "\n" + oracleEncodeFix +
      s"""
         |SELECT CASE WHEN regexp_full_match(fdw.w, '[a-zA-Z]+')
         |              THEN 'letter'
         |            WHEN regexp_full_match(fdw.w, '[0-9]+')
         |              THEN 'digit'
         |            ELSE 'punct' END AS tok_class,
         |  CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(len(fdw.w)) AS BIGINT) AS n_chars,
         |  CAST(SUM(ftok.n_tok) AS BIGINT) AS n_tokens,
         |  (1000 * CAST(SUM(ftok.n_tok) AS BIGINT))
         |    // CAST(COUNT(*) AS BIGINT) AS fert_permille
         |FROM fdw JOIN ftok ON fdw.w = ftok.w
         |GROUP BY tok_class""".stripMargin) { (spark, dir) =>
    val delta = Tables.documents(spark, dir)
      .filter(col("doc_id") % Dedup.IncrementalDeltaMod === 0)
    val docWords = delta.select(col("doc_id"),
      explode(regexp_extract_all(col("text"),
        lit(TokenRe), lit(0))).as("w"))
    docWords
      .join(broadcast(typeSegments(docWords,
        standingMerges(spark, dir))
        .select(col("w"), size(col("syms")).cast("long").as("n_tok"))),
        Seq("w"))
      .groupBy(
        when(col("w").rlike("^[a-zA-Z]+$"), "letter")
          .when(col("w").rlike("^[0-9]+$"), "digit")
          .otherwise("punct").as("tok_class"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("long")).as("n_chars"),
        sum(col("n_tok")).as("n_tokens"))
      .select(col("tok_class"), col("n_words"), col("n_chars"),
        col("n_tokens"),
        expr("(1000 * n_tokens) div n_words").as("fert_permille"))
  }

  /** The standing INVENTORY with sort-order ids (sym, id) — the final
    * segmented vocab's distinct symbols ranked by binary sort order,
    * 1-based (0 is reserved for unk). Vocab-sized, so the ranking
    * window and any broadcast of it are artifact-bounded. Shared by
    * the batch token emitter and the streaming leg. */
  private[graft] def inventoryIds(spark: SparkSession, dir: String)
      : DataFrame =
    standingVocab(spark, dir)
      .select(explode(col("syms")).as("sym")).distinct()
      .withColumn("id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("sym")))
        .cast("long"))

  /** The induction replayed relationally for DuckDB: iterated
    * argmax + greedy merge, where greedy-within-a-run is the parity
    * rule — inside each maximal run of match positions, merge starts
    * sit at even offsets from the run head (for a ≠ b runs have
    * length 1, so every match merges; for a = b this is exactly the
    * left-to-right scan). Produces CTEs `r0..rN`, `m1..mN` and
    * `merge_table`. */
  /** Shared oracle prefix: standing-slice word types exploded to
    * (w, freq, pos, sym) — CTEs `w0`, `v0`, `r0`. Declared
    * `WITH RECURSIVE` so the encode oracles can append a recursive
    * fixpoint CTE (harmless for the purely-iterative induction). */
  private def oraclePrefix: String =
    s"""WITH RECURSIVE w0 AS (
       |  SELECT unnest(regexp_extract_all(text, '$TokenRe')) AS w
       |  FROM documents WHERE doc_id % ${Dedup.IncrementalDeltaMod} <> 0
       |), v0 AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM w0 GROUP BY w
       |), r0 AS MATERIALIZED (
       |  SELECT w, freq,
       |    unnest(range(1, len(w) + 2)) AS pos,
       |    unnest(list_append(list_transform(range(1, len(w) + 1),
       |      i -> substring(w, CAST(i AS INTEGER), 1)), '$Marker')) AS sym
       |  FROM v0
       |)""".stripMargin

  private[operators] def oracleInduction(n: Int): String = {
    val sb = new StringBuilder
    sb.append(oraclePrefix)
    for (k <- 1 to n) {
      val p = k - 1
      sb.append(
        s""", m$k AS MATERIALIZED (
           |  SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
           |    SELECT sym AS a,
           |      lead(sym) OVER (PARTITION BY w ORDER BY pos) AS b, freq
           |    FROM r$p)
           |  WHERE b IS NOT NULL GROUP BY a, b
           |  ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
           |), g$k AS (
           |  SELECT w, freq, pos, sym,
           |    lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt,
           |    COALESCE(sym = (SELECT a FROM m$k) AND
           |      lead(sym) OVER (PARTITION BY w ORDER BY pos)
           |        = (SELECT b FROM m$k), FALSE) AS mt
           |  FROM r$p
           |), h$k AS (
           |  SELECT *, CASE WHEN mt THEN pos -
           |    row_number() OVER (PARTITION BY w, mt ORDER BY pos) END AS isl
           |  FROM g$k
           |), s$k AS (
           |  SELECT *, mt AND ((pos -
           |    min(pos) OVER (PARTITION BY w, isl)) % 2 = 0) AS st
           |  FROM h$k
           |), r$k AS MATERIALIZED (
           |  SELECT w, freq,
           |    row_number() OVER (PARTITION BY w ORDER BY pos) AS pos, sym
           |  FROM (
           |    SELECT w, freq, pos,
           |      CASE WHEN st THEN sym || nxt ELSE sym END AS sym,
           |      COALESCE(lag(st) OVER (PARTITION BY w ORDER BY pos),
           |        FALSE) AS dropme
           |    FROM s$k)
           |  WHERE NOT dropme
           |)""".stripMargin)
    }
    sb.append("\n, merge_table AS (\n")
    sb.append((1 to n).map(k =>
      s"  SELECT CAST($k AS INTEGER) AS merge_rank, a AS left_sym, " +
        s"b AS right_sym, cnt AS pair_count FROM m$k")
      .mkString("\n  UNION ALL\n"))
    sb.append("\n)")
    sb.toString
  }

  /** [[trainFullBatch]]'s law replayed for DuckDB: per round, the
    * ranked top-k pair window, the one-hop-domination anti-join, and
    * ONE simultaneous merge pass — the gaps-and-islands parity form
    * generalizes untouched because accepted pairs are symbol-disjoint
    * (consecutive matched positions are necessarily one (a, a) run;
    * matches of distinct accepted pairs can never overlap or adjoin). */
  private[operators] def oracleInductionParallel(rounds: Int, k: Int)
      : String = {
    val sb = new StringBuilder
    sb.append(oraclePrefix)
    for (r <- 1 to rounds) {
      val p = r - 1
      sb.append(
        s""", t$r AS (
           |  SELECT a, b, cnt,
           |    row_number() OVER (ORDER BY cnt DESC, a ASC, b ASC) AS rk
           |  FROM (
           |    SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
           |      SELECT sym AS a,
           |        lead(sym) OVER (PARTITION BY w ORDER BY pos) AS b, freq
           |      FROM r$p)
           |    WHERE b IS NOT NULL GROUP BY a, b)
           |  QUALIFY rk <= $k
           |), acc$r AS MATERIALIZED (
           |  SELECT a, b, cnt, rk FROM t$r t1
           |  WHERE NOT EXISTS (SELECT 1 FROM t$r t2 WHERE t2.rk < t1.rk
           |    AND (t2.a = t1.a OR t2.a = t1.b
           |         OR t2.b = t1.a OR t2.b = t1.b))
           |), g$r AS (
           |  SELECT s.w, s.freq, s.pos, s.sym, s.nxt,
           |    (x.a IS NOT NULL) AS mt
           |  FROM (
           |    SELECT w, freq, pos, sym,
           |      lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
           |    FROM r$p) s
           |  LEFT JOIN acc$r x ON x.a = s.sym AND x.b = s.nxt
           |), h$r AS (
           |  SELECT *, CASE WHEN mt THEN pos -
           |    row_number() OVER (PARTITION BY w, mt ORDER BY pos) END AS isl
           |  FROM g$r
           |), s$r AS (
           |  SELECT *, mt AND ((pos -
           |    min(pos) OVER (PARTITION BY w, isl)) % 2 = 0) AS st
           |  FROM h$r
           |), r$r AS MATERIALIZED (
           |  SELECT w, freq,
           |    row_number() OVER (PARTITION BY w ORDER BY pos) AS pos, sym
           |  FROM (
           |    SELECT w, freq, pos,
           |      CASE WHEN st THEN sym || nxt ELSE sym END AS sym,
           |      COALESCE(lag(st) OVER (PARTITION BY w ORDER BY pos),
           |        FALSE) AS dropme
           |    FROM s$r)
           |  WHERE NOT dropme
           |)""".stripMargin)
    }
    sb.append("\n, merge_table AS (\n")
    sb.append("  SELECT CAST(row_number() OVER (ORDER BY rnd, rk)")
    sb.append(" AS INTEGER) AS merge_rank,\n")
    sb.append("    a AS left_sym, b AS right_sym, cnt AS pair_count\n")
    sb.append("  FROM (\n")
    sb.append((1 to rounds).map(r =>
      s"    SELECT $r AS rnd, a, b, cnt, rk FROM acc$r")
      .mkString("\n    UNION ALL\n"))
    sb.append(")\n)")
    sb.toString
  }

  /** The encode path replayed for DuckDB: the rank-priority FIXPOINT
    * law ([[encodeFixpoint]]) as a RECURSIVE CTE — per delta word
    * type, each recursion step looks up the minimum merge rank among
    * the type's adjacent symbol pairs and applies that one merge
    * greedily left-to-right; a type with no applicable pair stops
    * producing rows, and the final state per type is the
    * deepest-iteration row. The greedy all-occurrences scan is a
    * single `replace` over a tab-wrapped rendering (`\t s \t` per
    * symbol — tokens are whitespace-free so `\t` never occurs inside
    * a symbol, and the per-symbol wrapping makes matches
    * boundary-aligned and non-overlapping exactly like the scan).
    * Unlike the engine's per-round unroll this plan is O(1) in merge
    * count on the oracle side too. Emits CTEs `fmt` (merge lookup),
    * `fdw` (delta doc words with position), `ffix` (final
    * segmentation per type), `ftok` (type → token count) and `enc`
    * (per-document stats). */
  private[operators] def oracleEncodeFix: String =
    s""", fmt AS MATERIALIZED (
       |  SELECT left_sym AS a, right_sym AS b, merge_rank AS rk
       |  FROM merge_table
       |), fdw AS MATERIALIZED (
       |  SELECT doc_id, i AS w_idx, ws[i] AS w
       |  FROM (SELECT doc_id,
       |          regexp_extract_all(text, '$TokenRe') AS ws
       |        FROM documents
       |        WHERE doc_id % ${Dedup.IncrementalDeltaMod} = 0),
       |       unnest(range(1, len(ws) + 1)) AS t(i)
       |), finit AS (
       |  SELECT w, list_append(list_transform(range(1, len(w) + 1),
       |    i -> substring(w, CAST(i AS INTEGER), 1)), '$Marker') AS syms
       |  FROM (SELECT DISTINCT w FROM fdw)
       |), fst AS (
       |  SELECT w, syms, 0 AS it FROM finit
       |  UNION ALL
       |  SELECT s.w,
       |    string_split(substring(rep, 2, length(rep) - 2),
       |      chr(9) || chr(9)) AS syms,
       |    s.it + 1 AS it
       |  FROM (
       |    SELECT q.w, q.it,
       |      replace(
       |        chr(9) || array_to_string(q.syms, chr(9) || chr(9))
       |          || chr(9),
       |        chr(9) || m.a || chr(9) || chr(9) || m.b || chr(9),
       |        chr(9) || m.a || m.b || chr(9)) AS rep
       |    FROM (
       |      SELECT w, syms, it,
       |        (SELECT min(fmt.rk) FROM fmt
       |         WHERE list_contains(
       |           list_transform(range(1, len(syms)),
       |             i -> syms[i] || chr(9) || syms[i + 1]),
       |           fmt.a || chr(9) || fmt.b)) AS br
       |      FROM fst) q
       |    JOIN fmt m ON m.rk = q.br) s
       |), ffix AS MATERIALIZED (
       |  SELECT w, syms FROM (
       |    SELECT w, syms,
       |      row_number() OVER (PARTITION BY w ORDER BY it DESC) AS rn
       |    FROM fst) WHERE rn = 1
       |), ftok AS (
       |  SELECT w, CAST(len(syms) AS BIGINT) AS n_tok FROM ffix
       |), enc AS (
       |  SELECT fdw.doc_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_words,
       |    CAST(SUM(len(fdw.w)) AS BIGINT) AS n_chars,
       |    CAST(SUM(ftok.n_tok) AS BIGINT) AS n_tokens
       |  FROM fdw JOIN ftok ON fdw.w = ftok.w
       |  GROUP BY fdw.doc_id
       |)""".stripMargin
}
