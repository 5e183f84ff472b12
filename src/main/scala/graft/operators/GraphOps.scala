package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph stage of the dedup pipeline (north star, SURVEY §7.4): pair
  * detection (MinHash/SimHash/Jaccard) emits near-dup EDGES, but what a
  * curation pipeline actually needs is duplicate CLUSTERS — transitive
  * closure over the pair graph, one canonical representative kept per
  * cluster (the union-find step of SlimPajama/Dolma-style dedup).
  *
  * Scale design: iterative min-label propagation over the edge list —
  * each round is one shuffle join (edges ⋈ labels) + one hash aggregate,
  * all map-side-combinable; the driver holds only the loop counter and a
  * converged flag (an `isEmpty` probe per round, never data). Rounds =
  * pair-graph diameter. Near-dup graphs are the BEST case for this:
  * duplicate clusters are near-cliques (diameter ≤ 2–3 — measured: the
  * testdata corpus converges in 2 rounds at every SF), so propagation
  * beats the O(log² n) star-contraction alternative (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) on constant
  * factors while staying a fraction of its code. A corpus with
  * adversarially long duplicate CHAINS would switch to star contraction;
  * the API boundary here (any (src,dst) edge frame in, (node,label) out)
  * is exactly where that swap would land.
  *
  * Lineage: iterative plans grow multiplicatively, so each round's label
  * frame is `localCheckpoint`ed (eager) — the next round's plan starts
  * from materialized blocks, not the whole join history. On a real
  * cluster this becomes reliable `checkpoint` to the lakehouse; the
  * choice is a config, not a shape change.
  */
object GraphOps {

  /** Release the block-manager copy behind a `localCheckpoint`ed frame
    * (its analyzed plan is a LogicalRDD over the materialized RDD).
    * Without this, superseded per-round snapshots stay pinned until the
    * RDD is GC'd and the ContextCleaner gets to it — deterministic
    * release keeps a long-lived session's storage memory flat. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Connected components of the undirected graph given as an edge
    * frame: returns (node, lbl) where lbl = min node id reachable.
    * Deterministic for any edge order. Propagation provably converges
    * in ≤ diameter+1 rounds; `maxRounds` is the safety bound for a
    * pathological input, and hitting it without convergence THROWS —
    * a silently split cluster (multiple canonicals for one real
    * component) must never look like success.
    */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 64): DataFrame = {
    // symmetric edge list, checkpointed ONCE: every round re-reads the
    // edges, and their upstream lineage (e.g. the whole MinHash+LSH
    // candidate pipeline) must not re-execute per round
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // each node's candidate label: min over incoming neighbours' labels
      val nbrMin = sym.join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("lbl")).as("nbr_lbl"))
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      // labels only ever decrease ⇒ "any strict decrease" = "changed"
      converged = next.alias("n").join(labels.alias("p"), Seq("node"))
        .filter(col("n.lbl") < col("p.lbl"))
        .isEmpty
      releaseCheckpoint(labels) // superseded round snapshot
      labels = next
      round += 1
    }
    releaseCheckpoint(sym)
    require(converged,
      s"connectedComponents did not converge within $maxRounds rounds — " +
        "graph diameter exceeds the bound; raise maxRounds (propagation " +
        "needs diameter+1 rounds) or switch to star-contraction")
    labels
  }

  /** Duplicate-cluster resolution over the verified near-dup pair set
    * (J ≥ 0.5 — the exact contract q_minhash_lsh is oracled to): each
    * doc appearing in any near-dup pair is assigned its cluster
    * (transitive closure), cluster id = min doc_id, which is also the
    * canonical representative a pipeline would keep. Oracle recomputes
    * the closure in SQL with a recursive CTE over the same all-pairs
    * J ≥ 0.5 edge set.
    */
  val dupClusters: Op = Op(
    "q_dup_clusters",
    s"""WITH RECURSIVE ${Dedup.jaccardPairCtes()},
       |np AS (
       |  SELECT doc_id_a, doc_id_b FROM pairs
       |  WHERE CAST(i AS DOUBLE)/CAST(u AS DOUBLE) >= 0.5
       |), edges AS (
       |  SELECT doc_id_a AS src, doc_id_b AS dst FROM np
       |  UNION ALL
       |  SELECT doc_id_b, doc_id_a FROM np
       |), reach AS (
       |  SELECT src AS node, src AS lbl FROM edges
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
       |), cc AS (
       |  SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
       |)
       |SELECT doc_id, cluster_id,
       |       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |       doc_id = cluster_id AS is_canonical
       |FROM cc""".stripMargin) { (spark, dir) =>
    val pairs = Dedup.minhashLshPairs(spark, dir, bucketCap = None)
      .select("doc_id_a", "doc_id_b")
    val cc = connectedComponents(pairs, "doc_id_a", "doc_id_b")
    val sizes = cc.groupBy(col("lbl").as("cid"))
      .agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, col("lbl") === col("cid"))
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"),
        col("cluster_size"),
        (col("node") === col("lbl")).as("is_canonical"))
  }
}
