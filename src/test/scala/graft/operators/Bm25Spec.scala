package graft.operators

import graft.SparkSpec

/** BM25 retrieval: integer contract invariants + the 100 TB plan shape
  * (queries broadcast to postings; the corpus never shuffles to meet
  * them; top-k windows over aggregated (query, doc) rows only).
  */
class Bm25Spec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private lazy val out = TextOps.bm25.build(spark, sf001).cache()

  test("contract: self excluded, dense ranks from 1, positive scores") {
    assert(out.filter(col("qid") === col("doc_id")).isEmpty,
      "a query must never retrieve itself")
    assert(out.filter(col("score") <= 0).isEmpty,
      "every retrieved doc shares >=1 query term, so scores are positive")
    val ranks = out.groupBy("qid")
      .agg(min("rnk").as("lo"), max("rnk").as("hi"), count(lit(1)).as("n"))
      .collect()
    assert(ranks.nonEmpty, "query set (doc_id % 101 = 0) must be non-empty")
    ranks.foreach { r =>
      assert(r.getAs[Long]("lo") == 1L && r.getAs[Long]("hi") == r.getAs[Long]("n"),
        s"ranks must be dense 1..n per query: $r")
    }
    assert(ranks.forall(_.getAs[Long]("n") <= TextOps.Bm25K))
  }

  test("ranking is idf-sane: top hit shares a rare query term") {
    // for each query, its rank-1 doc must contain at least one >=7-char
    // term of the query doc — retrieval by shared rare terms, not noise
    val docs = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("w"))
    val top1 = out.filter(col("rnk") === 1)
      .join(docs.select(col("doc_id").as("qid"), col("w").as("qw")), "qid")
      .join(docs.select(col("doc_id"), col("w").as("dw")), "doc_id")
      .withColumn("shared", size(array_intersect(
        filter(col("qw"), t => length(t) >= 7), col("dw"))))
    assert(top1.filter(col("shared") < 1).isEmpty,
      "rank-1 doc shares no rare term with its query")
  }

  test("pruned sibling: postings capped per term, rank-1 preserved") {
    // the scale contract: every term keeps at most P postings, so
    // per-query candidates are bounded by |query terms| * P at ANY
    // corpus size (the soak-measured fix for the unpruned log's ~2.1
    // growth exponent)
    val perTerm = TextOps.bm25PrunedIndex(spark, sf001)
      .groupBy("term").count()
    assert(perTerm.filter(col("count") > TextOps.Bm25PrunePostings).isEmpty,
      s"a term kept more than ${TextOps.Bm25PrunePostings} postings")
    // pruning must not change who wins: rank-1 agreement with the
    // unpruned op (measured 1.0 at sf0.001/sf0.01/sf0.1; pinned lower)
    val full = out.filter(col("rnk") === 1)
      .select("qid", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pruned = TextOps.bm25Pruned.build(spark, sf001)
      .filter(col("rnk") === 1).select("qid", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = full.keys.count(q => pruned.get(q).contains(full(q)))
    assert(agree.toDouble / full.size >= 0.9,
      s"rank-1 agreement $agree/${full.size} below the 0.9 floor")
  }

  test("session-cached tf index equals fresh construction") {
    val cached = TextOps.tfIndex(spark, sf001)
    val fresh = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("w"))
      .select(col("doc_id"), org.apache.spark.sql.functions.size(col("w"))
        .cast("long").as("dl"), explode(col("w")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    assert(cached.exceptAll(fresh).isEmpty && fresh.exceptAll(cached).isEmpty,
      "cached tf index drifted from deterministic reconstruction")
  }

  test("plan: queries broadcast into postings; window over aggregates only") {
    val p = out.queryExecution.executedPlan.toString
    // r15: the qdf join and the stats cross join are GONE — df rides
    // the cached rare index's rows and the corpus stats inline as
    // literals — so the one remaining join is qterms→postings, and it
    // must broadcast the query side
    val broadcasts = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 1,
      s"query terms must broadcast into the postings (got $broadcasts):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-vs-corpus shuffle join in the retrieval path:\n$p")
    // the window input is the (qid, doc_id) score aggregate, never raw
    // postings: a HashAggregate must sit below the Window subtree
    val lines = p.linesIterator.toVector
    val winIdx = lines.indexWhere(_.contains("Window"))
    assert(winIdx >= 0, s"expected a top-k window in:\n$p")
    assert(lines.drop(winIdx).exists(_.contains("HashAggregate")),
      s"window must consume the score aggregate, not postings:\n$p")
  }
}
