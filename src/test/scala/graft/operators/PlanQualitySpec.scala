package graft.operators

import graft.SparkSpec

/** Physical-plan quality gates: the properties that decide whether a
  * query survives a 100× scale-up — predicate pushdown into the parquet
  * scan, column pruning, broadcast joins for dimensions, map-side
  * partial aggregation — asserted on the actual executed plan strings
  * so a regression (e.g. a filter that silently stops pushing after a
  * refactor) fails CI, not the cluster.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(op: Op): String =
    op.build(spark, sf001).queryExecution.executedPlan.toString()

  test("data card: pure aggregation chain — per-doc laws in the scan " +
    "stage, no window, no join, bounded exchanges") {
    val p = plan(TextOps.dataCard)
    assert(!p.contains("Window"), s"no window belongs in a rollup:\n$p")
    assert(!p.contains("Join"), s"no join belongs in a rollup:\n$p")
    // two-phase distinct + final rollup: partial on (lang, source, fp),
    // exchange, distinct-fold, exchange on (lang, source) — anything
    // beyond that means a per-doc law fell out of the scan stage
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2,
      s"expected the two aggregation exchanges at most, got $exchanges:\n$p")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("doc_id"),
      s"doc_id is not needed — column pruning regressed:\n$read")
  }

  test("date-window filter pushes down to the parquet scan") {
    val p = plan(Rollup.dateWindowAgg)
    assert(p.contains("GreaterThanOrEqual(o_orderdate") &&
      p.contains("LessThan(o_orderdate"),
      s"expected pushed orderdate bounds in:\n$p")
  }

  test("anti-join: both legs read ONE materialized key aggregate, " +
    "null-safe anti join stays") {
    // r14: the former two date-filtered DISTINCTs (two lineitem scans,
    // two distinct shuffles — each leg DID push its shipdate bound,
    // which the old gate pinned) collapsed into one grouped scan with
    // per-side presence flags, localCheckpointed so both legs read the
    // same materialization. A parquet scan in THIS plan means a leg
    // regressed to its own lineitem pass; shipdate-range pushdown
    // keeps its witness in the date-window gate above.
    val p = plan(Normalize.antiJoin)
    assert(p.contains("LeftAnti"), s"expected the anti join in:\n$p")
    // PRIMARY witness: no parquet scan — a leg re-scanning lineitem is
    // the regression this gate exists to catch
    assert(!p.contains("Scan parquet"),
      s"legs must read the materialized key aggregate, not re-scan:\n$p")
    // secondary: at least the two legs read the checkpointed aggregate
    // (>= rather than ==, r15 ADVICE — AQE exchange reuse or a future
    // third checkpointed input must not fail the gate spuriously)
    val rdds = "Scan ExistingRDD".r.findAllIn(p).size
    assert(rdds >= 2,
      s"expected both anti-join legs to read the checkpointed key " +
        s"aggregate (>= 2 ExistingRDD scans), got $rdds:\n$p")
  }

  test("column pruning: q1 agg scans only the five needed lineitem columns") {
    val p = plan(Pricing.pricingAgg)
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_returnflag") && read.contains("l_quantity"))
    assert(!read.contains("l_comment") && !read.contains("l_shipdate"),
      s"scan reads pruned columns: $read")
  }

  test("revalue price dimension joins as broadcast, not shuffle") {
    val p = plan(Revalue.revalueUsers)
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$p")
  }

  test("star join: all three dimension joins broadcast") {
    val p = plan(Analytics.starJoin)
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 2, s"expected >=2 broadcast joins, got $broadcasts:\n$p")
  }

  test("balanced sample rides the rank-limit pushdown, counts broadcast") {
    val p = plan(Curation.balancedSample)
    assert(p.contains("WindowGroupLimit"),
      s"expected per-partition rank-limit pushdown:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"class counts should broadcast back:\n$p")
  }

  test("int8 quantization is shuffle-free map work") {
    val p = plan(Similarity.quantizeInt8)
    assert(!p.contains("Exchange"), s"expected zero shuffles:\n$p")
  }

  test("PQ/ADC: codebook and LUT broadcast; no code-content shuffle") {
    for (op <- Seq(Similarity.annPq, Similarity.pqAdc)) {
      val p = plan(op)
      assert(p.contains("BroadcastExchange"),
        s"${op.name}: codebook/LUT must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"${op.name}: nothing here should sort-merge:\n$p")
    }
  }

  test("semi join plans LeftSemi with no post-join distinct") {
    val p = plan(Analytics.semiJoin)
    assert(p.contains("LeftSemi"), s"expected a LeftSemi join in:\n$p")
    assert(!p.contains("HashAggregate"),
      s"a semi join needs no dedup aggregate:\n$p")
  }

  test("best-of-day is a hash aggregate with map-side partial combine") {
    val p = plan(Pricing.bestOfDay)
    assert(!p.contains("Window"), "top-1 should not need a window sort")
    assert("HashAggregate".r.findAllIn(p).size >= 2 ||
      "ObjectHashAggregate".r.findAllIn(p).size >= 2 ||
      "SortAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregate pair in:\n$p")
  }

  test("embed near-dup: exact path equi-joins on label; ANN variant keys on cell") {
    // exact path: the block product must live INSIDE a hash equi-join on
    // label — never a cartesian product
    val p = plan(Similarity.embedNearDup)
    assert(!p.contains("CartesianProduct"),
      s"unexpected cartesian product in exact path:\n$p")
    // ANN variant: candidates key on the IVF cell
    val pa = Similarity.embedNearDupAnn.build(spark, sf001)
      .queryExecution.executedPlan.toString()
    assert(pa.contains("cell"), s"expected IVF-cell join keys in:\n$pa")
    assert(!pa.contains("CartesianProduct"),
      s"unexpected cartesian product in ANN variant:\n$pa")
  }

  test("simhash plans band-bucket equi-joins with the hamming cut fused in") {
    val p = plan(Dedup.simhash)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"simhash candidates must come from band equi-joins:\n$p")
    // the tight tier's radius-3 cut must ride the JOIN NODE ITSELF
    // (fused into the join stage), not a post-dedup filter — reverting
    // that reintroduces the raw band-collision dedup shuffle this plan
    // exists to avoid. In the plan string the join's non-equi condition
    // prints on the join's own line, so some "<= 3" line must also name
    // the join.
    val cutLines = p.linesIterator.filter(_.contains("<= 3")).toSeq
    assert(cutLines.nonEmpty, s"missing hamming cut in:\n$p")
    assert(cutLines.exists(_.contains("Join")),
      s"hamming cut not fused into the join condition:\n$p")
  }

  test("range join plans as broadcast equi-join on day buckets, not nested loop") {
    val p = plan(AsOf.rangeJoin)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join fell back to a nested-loop product:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"expected day-bucket broadcast equi-join in:\n$p")
  }

  test("curation selection ops are shuffle-free map work") {
    // sampling, splitting, scrubbing, and the repetition gate are pure
    // per-row selection — ANY Exchange in these plans means a shuffle
    // crept into what must stay a single map pass over 100 TB
    for (op <- Seq(Curation.stratifiedSample, Curation.trainTestSplit,
        Curation.piiScrub, Curation.repetitionGate)) {
      val p = plan(op)
      assert(!p.contains("Exchange"),
        s"${op.name} must be map-only, got:\n$p")
    }
  }

  test("quality gate: one scalar aggregate broadcast back, no row shuffle") {
    // the P25 threshold is a single global aggregate (partial → final,
    // 1-row exchange); the corpus itself must NOT be re-partitioned,
    // and the threshold joins back as a broadcast
    val p = plan(Curation.qualityGate)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"threshold must broadcast:\n$p")
    val rowShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(rowShuffles === 0,
      s"corpus rows must not shuffle for a scalar threshold, got:\n$p")
  }

  test("decontamination joins the benchmark grams as broadcast") {
    // the benchmark/eval side is small by construction (MBs vs 100 TB) —
    // the train scan must meet it in a broadcast hash join, never a
    // shuffle of the train grams for a sort-merge join
    val p = plan(Curation.decontaminate)
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark grams must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"train grams must not shuffle for the gram join:\n$p")
  }

  test("mix assembly broadcasts per-source factors over one map pass") {
    // factors are #sources rows; the corpus must be scanned exactly once
    // and never hash-partitioned to meet them
    val p = plan(Curation.mixAssembly)
    assert(p.contains("BroadcastHashJoin"),
      s"source factors must broadcast:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, // doc scan + the (tiny) factor branch's scan
      s"expected at most 2 parquet scans, got $scans:\n$p")
  }

  test("temperature mix broadcasts per-source factors over one map pass") {
    val p = plan(Curation.temperatureMix)
    assert(p.contains("BroadcastHashJoin"),
      s"source factors must broadcast:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 2,
      s"expected at most 2 parquet scans, got $scans:\n$p")
  }

  test("doc chunking is a shuffle-free generate in the scan stage") {
    val p = plan(TextOps.docChunks)
    assert(!p.contains("Exchange"),
      s"chunking must be map-only, got:\n$p")
    assert(p.contains("Generate"), s"expected chunk explode in:\n$p")
  }

  test("fuzzy match: brand equi-join with the distance cuts fused in") {
    // gate the pair-graph BUILD plan: the registered op reads the
    // session-cached pair index (a checkpoint scan), so the join under
    // inspection lives in the index construction
    val p = Dedup.fuzzyJoin(spark, sf001, withDp = true)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy candidates must come from the brand equi-join:\n$p")
    // the threshold-DP cut must ride the join node itself, not a
    // post-join filter over the full block product
    val cutLines = p.linesIterator.filter(_.contains("levenshtein")).toSeq
    // the threshold arg prints as Some(2) in the join's condition line
    assert(cutLines.exists(l => l.contains("Join") && l.contains("Some(2)")),
      s"threshold levenshtein not fused into the join condition:\n$p")
    // conjunct ORDER is load-bearing: And short-circuits left-to-right
    // in the generated join loop, so the O(1) bag-distance bound must
    // appear BEFORE the O(n·k) threshold DP in the fused condition.
    // (A draft that expressed the DP as a post-join filter had it
    // merged back PREPENDED — measured 2× slower than this order.)
    val joinLine = p.linesIterator
      .find(l => l.contains("Join") && l.contains("graft_bag_dist"))
      .getOrElse(fail(s"bag-distance cut not fused into the join:\n$p"))
    assert(joinLine.indexOf("graft_bag_dist") <
      joinLine.indexOf("levenshtein"),
      s"bag cut must precede the threshold DP in:\n$joinLine")
  }

  test("bloom join: runtime filter reaches the fact scan") {
    // the selective dim side must materialize a bloom subquery and the
    // fact scan must carry might_contain — the shuffle-join-regime
    // pruning that remains when both sides outgrow broadcast
    val p = plan(Scale.bloomJoin)
    assert(p.contains("bloom_filter_agg"),
      s"expected bloom creation subquery in:\n$p")
    assert(p.contains("might_contain"),
      s"expected might_contain on the fact side in:\n$p")
  }

  test("top-k per group aggregates BEFORE the rank window") {
    val p = plan(Analytics.topKPerGroup)
    val aggIdx = p.indexOfSlice("Aggregate")
    val winIdx = p.indexOfSlice("Window")
    assert(aggIdx >= 0 && winIdx >= 0 && winIdx < aggIdx,
      // plan prints top-down: Window (outer) should appear before (above)
      // the Aggregate feeding it
      s"expected window over pre-aggregated input in:\n$p")
  }

  test("embed outlier: centroid table broadcasts back, no self-join") {
    val p = plan(Similarity.embedOutlier)
    assert(p.contains("BroadcastHashJoin"),
      s"label-centroid table must broadcast onto the score pass:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"score pass must not shuffle or cross the vectors:\n$p")
  }

  test("MAD anomaly: per-user stats broadcast, aggregates partial-combine") {
    val p = plan(Analytics.anomalyMad)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"med and mad joins must both broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no event-scaled shuffle join expected:\n$p")
  }

  test("bigram LM: bigrams generate in the scan stage, window ranks the aggregate") {
    val p = plan(TextOps.bigramLm)
    // the doc-scaled work (Generate) must happen before the first
    // Exchange; the Window must sit over the aggregated counts
    val gen = p.indexOfSlice("Generate")
    val ex = p.indexOfSlice("Exchange")
    assert(gen >= 0 && ex >= 0 && gen > ex,
      // plan prints top-down: Generate (inner/earlier stage) should
      // appear BELOW the first Exchange
      s"bigram Generate must precede any shuffle in:\n$p")
    val winIdx = p.indexOfSlice("Window")
    val aggIdx = p.indexOfSlice("Aggregate")
    assert(winIdx >= 0 && aggIdx >= 0 && winIdx < aggIdx,
      s"expected window over the pre-aggregated bigram counts in:\n$p")
  }

  test("asof nearest runs BOTH directed native merges, no inequality join") {
    val p = plan(AsOf.asofNearest)
    assert("AsOfJoin".r.findAllIn(p).size >= 2,
      s"expected two native as-of execs in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"nearest pick must merge event-sized frames, not re-join orders:\n$p")
  }

  test("dsir weights: model tables broadcast back, corpus never re-sorts") {
    val p = plan(Retrieval.dsirWeights)
    assert(p.contains("BroadcastHashJoin"),
      s"expected the ${Retrieval.DsirDim}-row ratio table as a broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-scaled shuffle join belongs in the scoring pass:\n$p")
  }

  test("rrf fusion: vector queries broadcast; only the k-bounded rank " +
    "lists may sort-merge") {
    val p = plan(Retrieval.rrfFusion)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast query vectors in the brute-force list:\n$p")
    val smj = "SortMergeJoin".r.findAllIn(p).size
    assert(smj <= 1, s"expected at most the full-outer fuse join to " +
      s"sort-merge (both sides top-k frames), got $smj in:\n$p")
  }

  test("heavy hitters: global top-k plans TakeOrdered, not a full sort") {
    val p = plan(Scale.heavyHitters)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must be per-partition top-k + driver merge, got:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the one-row total must broadcast:\n$p")
  }

  test("histogram: single map-side-combinable aggregate over a pruned scan") {
    val p = plan(Introspect.histogram)
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_extendedprice") && !read.contains("l_orderkey"),
      s"histogram scan should read only the price column: $read")
    assert("Exchange".r.findAllIn(p).size === 1,
      s"histogram should shuffle exactly once (partial->final agg):\n$p")
  }

  test("epoch shuffle: position window partitions on (epoch, bucket), " +
    "never a whole epoch; offsets broadcast") {
    val p = plan(Curation.epochShuffle)
    // the document-scaled window must key on the range bucket — a
    // windowspec mentioning epoch without bucket would funnel each
    // epoch through one partition
    val winLines = p.linesIterator
      .filter(l => l.contains("windowspecdefinition") &&
        l.contains("row_number()"))
      .toSeq
    assert(winLines.nonEmpty, s"no position window found:\n$p")
    winLines.foreach { l =>
      assert(l.contains("bucket"),
        s"position window not bucket-partitioned: $l")
    }
    assert(p.contains("BroadcastExchange"),
      s"bucket offsets must broadcast back:\n$p")
  }

  test("sequence packing: running-sum window partitions on (source, " +
    "bucket), never a whole source; offsets broadcast") {
    val p = plan(Curation.packSequences)
    // the doc-scaled running sum must key on the doc_id range bucket —
    // a windowspec on source alone funnels each source through one
    // partition (a corpus has FEW sources)
    val winLines = p.linesIterator
      .filter(l => l.contains("windowspecdefinition") &&
        l.contains("n_tokens"))
      .toSeq
    assert(winLines.nonEmpty, s"no running-sum window found:\n$p")
    winLines.foreach { l =>
      assert(!l.contains("source#") || l.contains("bucket"),
        s"running-sum window not bucket-partitioned: $l")
    }
    assert(p.contains("BroadcastExchange"),
      s"bucket offsets must broadcast back:\n$p")
  }

  test("incremental chunk dedup never rescans the corpus: the delta " +
    "is pinned once at build and the standing side is the persisted " +
    "keeper store") {
    val p = plan(TextOps.chunkDedupIncr)
    val docScans = p.linesIterator
      .count(l => l.contains("documents.parquet"))
    assert(docScans == 0,
      s"the final plan must hold zero documents scans (the delta is " +
        s"checkpointed once at build; the standing side is the store), " +
        s"got $docScans:\n$p")
    assert(p.contains("chunk_keepers"),
      s"standing keepers must come from the persisted store:\n$p")
  }

  test("bucketed keeper probe: sort-merge join, zero Exchange above " +
    "the keeper-table scan") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val p = TextOps.chunkDedupBucketed.build(spark, sf001)
      .queryExecution.sparkPlan
    val smjs = p.collect { case j: SortMergeJoinExec => j }
    val probe = smjs.find { j =>
      j.left.toString.contains("gb_chunk_keepers_") ||
        j.right.toString.contains("gb_chunk_keepers_")
    }
    assert(probe.nonEmpty,
      s"no SMJ reads the bucketed keeper table:\n$p")
    val keeperSide =
      if (probe.get.left.toString.contains("gb_chunk_keepers_"))
        probe.get.left
      else probe.get.right
    val shuffles = keeperSide.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"keeper side of the probe join re-shuffles:\n$keeperSide")
  }

  test("token-id emission: ONE broadcast type→ids join on the word " +
    "stream (ids resolved per TYPE through the bucketed inventory " +
    "map), no shuffle join — the only data-scaled exchange is the " +
    "per-doc fold") {
    val p = plan(Bpe.bpeTokens)
    // the intended invariant, not the planner's exact choice: at most
    // ONE broadcast hash join touches the word stream (the finished
    // w → ids table) — the inventory must ride the one-row bucketed
    // map inside the type stage, never a second data-side join. A
    // planner upgrade that legally broadcasts elsewhere should not
    // fail this; two or more would mean the inventory regressed to a
    // data-side join.
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts <= 1,
      s"at most the finished (w → ids) table may broadcast to the " +
        s"word stream; got $broadcasts:\n$p")
    // the inventory probe itself must appear: the one-row bucketed map
    // enters as a broadcast nested-loop cross on the TYPE table
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"bucketed inventory map must broadcast into the type stage:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no shuffle join belongs in the token stream:\n$p")
  }
}
