package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- RRF

  test("rrf fusion: fused top-5 equals driver-side recompute from the " +
    "component rank lists") {
    val lex = TextOps.bm25.build(spark, sf001)
      .select("qid", "doc_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val vec = Retrieval.vectorRanks(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val fused = (lex.keySet ++ vec.keySet).toSeq.map { k =>
      val s = lex.get(k).map(r => Retrieval.RrfScale / (Retrieval.RrfK + r))
        .getOrElse(0L) +
        vec.get(k).map(r => Retrieval.RrfScale / (Retrieval.RrfK + r))
          .getOrElse(0L)
      (k._1, k._2, s)
    }
    val expected = fused.groupBy(_._1).flatMap { case (qid, rows) =>
      rows.sortBy(t => (-t._3, t._2)).take(Retrieval.RrfTopK)
        .zipWithIndex.map { case ((_, doc, s), i) => (qid, doc, s, i + 1L) }
    }.toSet
    val got = Retrieval.rrfFusion.build(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
  }

  test("rrf fusion: a candidate ranked by BOTH systems carries both " +
    "contributions; single-system candidates carry exactly one") {
    val lexKeys = TextOps.bm25.build(spark, sf001)
      .select("qid", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val vecKeys = Retrieval.vectorRanks(spark, sf001)
      .select("qid", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bothMax = Retrieval.RrfScale / (Retrieval.RrfK + 1) * 2
    val singleMax = Retrieval.RrfScale / (Retrieval.RrfK + 1)
    val out = Retrieval.rrfFusion.build(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      val s = r.getLong(2)
      if (lexKeys(k) && vecKeys(k)) assert(s <= bothMax && s > singleMax)
      else assert(s <= singleMax && s > 0,
        s"single-system candidate $k scored $s")
    }
    // the fixture corpus must actually exercise the both-systems branch
    assert(out.exists(r => {
      val k = (r.getLong(0), r.getLong(1)); lexKeys(k) && vecKeys(k)
    }))
  }

  // --------------------------------------------------------------- DSIR

  /** The portable rolling hash, driver-side. */
  private def fp(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)

  test("dsir weights: scores and kept flags equal an independent " +
    "driver-side recompute (models, smoothing, floor-div ratio, p75)") {
    val docs = graft.Tables.documents(spark, sf001)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val D = Retrieval.DsirDim
    // per-doc bucket counts over hashed bigrams
    val perDoc = docs.map { case (id, lang, text) =>
      val w = "[a-z]+".r.findAllIn(text.toLowerCase).toVector
      val buckets = w.zip(w.drop(1)).map { case (a, b) => fp(s"$a $b") % D }
      (id, lang == Retrieval.DsirTargetLang,
        buckets.groupBy(identity).map { case (k, v) => k -> v.size.toLong })
    }.filter(_._3.nonEmpty)
    val cR = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val cT = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    perDoc.foreach { case (_, tgt, m) => m.foreach { case (b, c) =>
      cR(b) += c; if (tgt) cT(b) += c
    } }
    val tR = cR.values.sum; val tT = cT.values.sum
    def ratio(b: Long): Long =
      (BigInt(Retrieval.DsirScale) * (cT(b) + 1) * (tR + D) /
        (BigInt(cR(b) + 1) * (tT + D))).toLong
    val scores = perDoc.map { case (id, _, m) =>
      id -> m.map { case (b, c) => c * ratio(b) }.sum
    }.toMap
    // Spark percentile(x, q): index q*(n-1) into the sorted values,
    // linear interpolation
    val sorted = scores.values.toSeq.sorted
    val idx = Retrieval.DsirQuantile * (sorted.size - 1)
    val lo = sorted(idx.toInt)
    val hi = sorted(math.ceil(idx).toInt)
    val p75 = lo + (hi - lo) * (idx - idx.toInt)
    val out = Retrieval.dsirWeights.build(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.keySet === scores.keySet)
    scores.foreach { case (id, s) =>
      assert(out(id)._1 === s, s"score mismatch for doc $id")
      assert(out(id)._2 === (s >= p75), s"kept mismatch for doc $id")
    }
  }

  test("dsir weights: kept fraction is the top quartile (within ties)") {
    val out = Retrieval.dsirWeights.build(spark, sf001).collect()
    val n = out.length
    val kept = out.count(_.getBoolean(2))
    // p75 cut keeps ~25%; ties can only widen the kept side
    assert(kept >= n / 4 - 1 && kept <= n / 2,
      s"kept $kept of $n is not a plausible top quartile")
  }
}
