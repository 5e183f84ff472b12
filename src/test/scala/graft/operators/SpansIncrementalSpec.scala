package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Span-dedup family (Spans.scala) + incremental dedup behavior:
  * window-generation arithmetic, hashed-key parity, coverage
  * invariants, and incremental output vs the exact delta×corpus join.
  */
class SpansIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val W = Spans.SpanWindow

  test("session-cached window rows equal fresh construction") {
    val cached = Spans.windowRows(spark, sf001)
    val fresh = Spans.buildWindowRows(spark, sf001)
    assert(cached.exceptAll(fresh).isEmpty && fresh.exceptAll(cached).isEmpty,
      "cached window rows drifted from deterministic reconstruction")
  }

  test("window rows: each doc with n>=W tokens emits exactly n-W+1 windows") {
    val expected = graft.Tables.documents(spark, sf001)
      .select($"doc_id", size(split(trim($"text"), "\\s+")).as("n"))
      .filter($"n" >= W)
      .select($"doc_id", ($"n" - (W - 1)).cast("long").as("exp"))
      .as[(Long, Long)].collect().toMap
    val got = Spans.windowRows(spark, sf001)
      .groupBy($"doc_id").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
    // spot-check one window's content: first 8 tokens of the doc
    val (docId, _) = expected.head
    val row = graft.Tables.documents(spark, sf001)
      .filter($"doc_id" === docId).select($"text").as[String].head()
    val firstWin = row.trim.split("\\s+").take(W).mkString(" ")
    val gotWin = Spans.windowRows(spark, sf001)
      .filter($"doc_id" === docId && $"i" === 1)
      .select($"win_text").as[String].head()
    assert(gotWin === firstWin)
  }

  test("hashed span dedup carries the same duplicate structure as text-keyed") {
    val textKeyed = Spans.spanDedup.build(spark, sf001)
      .select($"ndocs", $"nocc").as[(Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    val hashKeyed = Spans.spanDedupHashed(spark, sf001)
      .select($"ndocs", $"nocc").as[(Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(textKeyed.nonEmpty, "expected duplicated windows in testdata")
    assert(hashKeyed === textKeyed)
  }

  test("span coverage: every doc present, covered within bounds, frac exact") {
    val rows = Spans.spanCoverage.build(spark, sf001)
      .select($"doc_id", $"n_tokens", $"covered", $"dup_frac")
      .as[(Long, Long, Long, Double)].collect()
    val nDocs = graft.Tables.documents(spark, sf001).count()
    assert(rows.length.toLong === nDocs)
    rows.foreach { case (id, n, cov, frac) =>
      assert(cov >= 0 && cov <= n, s"doc $id: covered $cov outside [0,$n]")
      assert(frac === cov.toDouble / n.toDouble, s"doc $id: frac mismatch")
      if (n < W) assert(cov === 0L, s"doc $id shorter than W has coverage")
    }
    assert(rows.exists(_._3 > 0), "expected some covered docs in testdata")
  }

  test("coverage agrees with a driver-side recomputation from window rows") {
    val wins = Spans.windowRows(spark, sf001)
      .select($"doc_id", $"i", $"win_text")
      .as[(Long, Int, String)].collect()
    val dupTexts = wins.groupBy(_._3).filter(_._2.length >= 2).keySet
    val expected = wins.filter(w => dupTexts.contains(w._3))
      .groupBy(_._1).view
      .mapValues(_.flatMap(w => w._2 until (w._2 + W)).distinct.length.toLong)
      .toMap
    val got = Spans.spanCoverage.build(spark, sf001)
      .filter($"covered" > 0)
      .select($"doc_id", $"covered").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("incremental dedup equals the exact delta-vs-corpus join") {
    // ground truth: all-pairs exact Jaccard across the split, no LSH
    val d = graft.Tables.documents(spark, sf001).select(
      $"doc_id", graft.functions.TextAnalysis.wordShingles($"text", 3).as("sh"))
    val delta = d.filter($"doc_id" % Dedup.IncrementalDeltaMod === 0)
      .select($"doc_id".as("ia"), $"sh".as("sa"))
    val corpus = d.filter($"doc_id" % Dedup.IncrementalDeltaMod =!= 0)
      .select($"doc_id".as("ib"), $"sh".as("sb"))
    val truth = delta.join(corpus,
        (size(array_intersect($"sa", $"sb")).cast("double") /
          size(array_union($"sa", $"sb")).cast("double")) >= 0.5)
      .groupBy($"ia")
      .agg(min($"ib").as("dup_of"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    val got = Dedup.dedupIncremental.build(spark, sf001)
      .select($"doc_id", $"dup_of", $"n_matches")
      .as[(Long, Long, Long)].collect().toSet
    assert(truth.nonEmpty, "expected cross-split near-dups in testdata")
    assert(got === truth)
  }

  test("incremental dedup probes the corpus index via a broadcast of the delta") {
    // Gate the candidate stage ALONE, and require that the broadcast
    // side of some hash join is the DELTA band rows (its subtree carries
    // the doc_id % 10 = 0 filter) — a BroadcastHashJoin appearing
    // anywhere (e.g. an auto-broadcast sizes join) must not satisfy
    // this test while the band probe itself shuffles the corpus.
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = Dedup.incrementalCandidates(spark, sf001)
      .queryExecution.sparkPlan
    val buildSides = plan.collect { case j: BroadcastHashJoinExec =>
      (j.buildSide match {
        case BuildLeft => j.left
        case BuildRight => j.right
      }).toString()
    }
    assert(buildSides.nonEmpty,
      s"delta band probe should broadcast, not shuffle the corpus:\n$plan")
    assert(buildSides.exists(s => s.contains("% 10) = 0")),
      "no BroadcastHashJoin builds on the delta-side filter " +
        s"(doc_id % 10 = 0); build sides were:\n${buildSides.mkString("\n---\n")}")
  }

  test("bucketed-index incremental dedup equals the broadcast-probe op") {
    val broadcastForm = Dedup.dedupIncremental.build(spark, sf001)
      .select($"doc_id", $"dup_of", $"n_matches", $"best_j")
      .as[(Long, Long, Long, Double)].collect().toSet
    val bucketedForm = Dedup.dedupIncrementalBucketed.build(spark, sf001)
      .select($"doc_id", $"dup_of", $"n_matches", $"best_j")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(broadcastForm.nonEmpty)
    assert(bucketedForm === broadcastForm)
  }

  test("bucketed probe: sort-merge join, zero Exchange above the index scan") {
    // the layout's whole value: the persisted corpus index is read
    // straight from its bucket files — a shuffle sneaking in above the
    // index scan means the bucketing stopped satisfying the join's
    // distribution requirement and the 100 TB probe re-shuffles the
    // corpus every batch.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val plan = Dedup.bucketedIncrementalCandidates(spark, sf001)
      .queryExecution.sparkPlan
    val smjs = plan.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected a sort-merge probe join in:\n$plan")
    val probe = smjs.find { j =>
      j.left.toString.contains("gb_minhash_idx_") ||
        j.right.toString.contains("gb_minhash_idx_")
    }
    assert(probe.nonEmpty,
      s"no SMJ reads the bucketed index table:\n$plan")
    val idxSide =
      if (probe.get.left.toString.contains("gb_minhash_idx_")) probe.get.left
      else probe.get.right
    val idxShuffles = idxSide.collect { case e: ShuffleExchangeExec => e }
    assert(idxShuffles.isEmpty,
      s"corpus index side of the probe join re-shuffles:\n$idxSide")
  }

  test("recall premise: every cross-split pair at J >= 0.5 sits at J >= 0.88") {
    // dedupIncremental's exact-join oracle holds because 8x4 banded LSH
    // recall is deterministic-1.0 only for high-J pairs; the measured
    // corpus property backing that is "no cross-split pair falls in
    // (0.5, 0.88)". Pin the premise so a testdata change that breaks it
    // fails HERE with a clear message, not via an opaque oracle
    // hash mismatch.
    val d = graft.Tables.documents(spark, sf001).select(
      $"doc_id", graft.functions.TextAnalysis.wordShingles($"text", 3).as("sh"))
    val delta = d.filter($"doc_id" % Dedup.IncrementalDeltaMod === 0)
      .select($"doc_id".as("ia"), $"sh".as("sa"))
    val corpus = d.filter($"doc_id" % Dedup.IncrementalDeltaMod =!= 0)
      .select($"doc_id".as("ib"), $"sh".as("sb"))
    val j = size(array_intersect($"sa", $"sb")).cast("double") /
      size(array_union($"sa", $"sb")).cast("double")
    val midBand = delta.join(corpus, j >= 0.5 && j < 0.88)
      .select($"ia", $"ib").as[(Long, Long)].collect()
    assert(midBand.isEmpty,
      "cross-split pairs in the LSH recall grey zone (0.5, 0.88) — " +
        "dedupIncremental's exact-join oracle premise is broken for: " +
        midBand.mkString(", "))
  }
}
