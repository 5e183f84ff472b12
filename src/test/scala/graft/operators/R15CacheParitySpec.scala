package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity pins for the round-15 session caches (the standing
  * convention: every cached shared index must equal its deterministic
  * fresh reconstruction on the same corpus) plus the pointer-jumped
  * CC kernel's deep-graph law.
  */
class R15CacheParitySpec extends SparkSpec {
  import spark.implicits._

  private def same(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, what: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what drifted from deterministic reconstruction")

  test("session-cached BM25 rare index equals fresh slice + df") {
    val cached = TextOps.bm25RareIndex(spark, sf001)
    val tf = TextOps.tfIndex(spark, sf001).filter(length($"term") >= 7)
    val fresh = tf.join(
      tf.groupBy($"term").agg(count(lit(1)).as("df")), Seq("term"))
    same(cached, fresh, "cached rare index")
  }

  test("session-cached BM25 pruned index equals fresh impact prune") {
    val cached = TextOps.bm25PrunedIndex(spark, sf001)
    val (nDocs, tTokens) = TextOps.bm25Stats(spark, sf001)
    val fresh = TextOps.bm25RareIndex(spark, sf001)
      .withColumn("n_docs", lit(nDocs))
      .withColumn("t_tokens", lit(tTokens))
      .withColumn("impact",
        expr("(1000000 * 44 * tf * t_tokens) div " +
          "(20*tf*t_tokens + 6*t_tokens + 18*dl*n_docs)"))
      .withColumn("pr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"term")
          .orderBy($"impact".desc, $"doc_id".asc)))
      .filter($"pr" <= TextOps.Bm25PrunePostings)
      .drop("pr", "impact", "n_docs", "t_tokens")
    same(cached, fresh, "cached pruned index")
  }

  test("session-cached bigram occurrence rows equal fresh explode") {
    val cached = TextOps.bigramRows(spark, sf001)
    val fresh = graft.Tables.documents(spark, sf001)
      .select($"doc_id", $"lang",
        explode_outer(TextOps.bigramArray).as("bg"))
      .select($"doc_id", $"lang",
        $"bg.w1".as("w1"), $"bg.w2".as("w2"))
    same(cached, fresh, "cached bigram rows")
  }

  test("session-cached semdedup assignment equals fresh argmax") {
    same(Similarity.semdedupAssign(spark, sf001),
      Similarity.semdedupAssignFresh(spark, sf001),
      "cached semdedup assignment")
  }

  test("session-cached pagerank static pair equals fresh derivation") {
    val (withDeg, r0) = GraphOps.pagerankStaticCached(spark, sf001)
    val und = GraphOps.copurchaseEdges(spark, sf001)
    val ed = und.select($"a".as("src"), $"b".as("dst"))
      .unionByName(und.select($"b".as("src"), $"a".as("dst")))
    val deg = ed.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    same(withDeg, ed.join(deg, Seq("src")), "cached pagerank withDeg")
    same(r0, deg.select($"src".as("node"),
      lit(GraphOps.PagerankScale).as("r")), "cached pagerank r0")
  }

  test("session-cached LPA edge frame equals fresh doubling") {
    val und = GraphOps.copurchaseEdges(spark, sf001)
    same(GraphOps.lpaEdgesCached(spark, sf001),
      und.select($"a".as("src"), $"b".as("dst"))
        .unionByName(und.select($"b".as("src"), $"a".as("dst"))),
      "cached LPA edges")
  }

  test("pointer-jumped CC converges on a deep chain to the plain " +
    "fixpoint, within the log-round budget") {
    // a 60-deep path: plain one-hop flooding needs 60 rounds (> the 24
    // budget below); the adaptive jump must both CONVERGE inside the
    // budget and land every node on the chain min
    val n = 60
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
      .toDF("s", "d")
    val labels = GraphOps.connectedComponents(edges, "s", "d",
      maxRounds = 24)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == n)
    assert(labels.values.forall(_ == 0L),
      s"chain labels not all at the component min: ${labels.toSeq.sorted}")
  }
}
