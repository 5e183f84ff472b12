package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style suites (SURVEY §5.3): each property evaluates a whole
  * generated corpus in ONE Spark job (hundreds of per-case jobs would
  * take minutes), comparing the engine against an independent Scala
  * model of the semantics.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // independent model of F1 centsFromMoney (ref 01_import:78-90)
  private def modelCents(s: String): Option[Long] = {
    val cleaned = s.trim.replaceAll("[$,]", "")
    if (cleaned.matches("^-?[0-9]+(\\.[0-9]+)?$"))
      Some(BigDecimal(cleaned).setScale(6)
        .*(100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    else None
  }

  test("parseCents is total and matches the model on arbitrary strings") {
    val moneyish: Gen[String] = for {
      neg <- Gen.oneOf("", "-")
      dollar <- Gen.oneOf("", "$")
      whole <- Gen.choose(0L, 999999999L)
      frac <- Gen.oneOf("", ".5", ".99", ".123", ".0001")
      comma <- Gen.oneOf(identity[String] _,
        (x: String) => x.reverse.grouped(3).mkString(",").reverse)
    } yield s"$neg$dollar${comma(whole.toString)}$frac"
    val junk: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr, Gen.const(""), Gen.const("  "), Gen.const("1.2.3"),
      Gen.const("$-"), Gen.const("--5"), Gen.const("1e5"), Gen.const("NaN"))
    val inputs = (sample(moneyish, 150, 42L) ++ sample(junk, 50, 7L)).distinct
    val got = inputs.toDF("s")
      .select($"s", functions.Money.parseCents($"s").as("cents"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    inputs.foreach { s =>
      assert(got(s) === modelCents(s), s"input '$s'")
    }
  }

  test("best-of-day output is invariant under input row order") {
    val base = operators.Pricing.bestOfDay.build(spark, sf001)
    val li = Tables.lineitem(spark, sf001)
      .orderBy(rand(12345)).repartition(7)
    li.write.mode("overwrite").parquet("/tmp/graft_prop_shuffled/lineitem.parquet")
    val shuffled = operators.Pricing.bestOfDay.build(spark, "/tmp/graft_prop_shuffled")
    assert(base.exceptAll(shuffled).isEmpty && shuffled.exceptAll(base).isEmpty,
      "row order / partitioning changed the answer")
  }

  test("upsertByDay is idempotent and replaces only the written day") {
    val out = "/tmp/graft_prop_upsert"
    val day1 = Seq((1L, "2026-01-01", 10L), (2L, "2026-01-01", 20L))
      .toDF("id", "d", "v").withColumn("d", $"d".cast("date"))
    val day2 = Seq((3L, "2026-01-02", 30L))
      .toDF("id", "d", "v").withColumn("d", $"d".cast("date"))
    sources.Sinks.upsertByDay(day1.unionByName(day2), out, "d")
    // re-write day1 with changed values: day2 must survive untouched
    val day1b = Seq((1L, "2026-01-01", 11L))
      .toDF("id", "d", "v").withColumn("d", $"d".cast("date"))
    sources.Sinks.upsertByDay(day1b, out, "d")
    sources.Sinks.upsertByDay(day1b, out, "d") // idempotent re-run
    val got = spark.read.parquet(out).select($"id", $"v")
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 11L), (3L, 30L)))
  }

  test("triangle kernel matches the brute-force model on random graphs") {
    // 40 random graphs on <= 12 nodes, evaluated as ONE union frame with
    // a graph-id column so the whole property is a single Spark job
    val graphGen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.choose(3, 12)
      density <- Gen.choose(1, 4)
      edges <- Gen.listOfN(n * density,
        Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield edges.collect {
      case (a, b) if a != b =>
        (math.min(a, b).toLong, math.max(a, b).toLong)
    }.distinct
    val graphs = sample(graphGen, 40, 1234L)
    def model(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
      val es = edges.toSet
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      (for {
        Seq(a, b, c) <- nodes.combinations(3)
        if es((a, b)) && es((a, c)) && es((b, c))
      } yield (a, b, c)).toSet
    }
    // one frame, graph-id offset keeps node ids disjoint across graphs
    val all = graphs.zipWithIndex.flatMap { case (es, g) =>
      es.map { case (a, b) => (a + g * 1000L, b + g * 1000L) }
    }.toDF("a", "b")
    val got = operators.GraphOps.trianglesOf(all)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, c) =>
        val s = Seq(a, b, c).sorted; (s(0), s(1), s(2)) }
      .groupBy(_._1 / 1000).view
      .mapValues(_.map { case (a, b, c) =>
        (a % 1000, b % 1000, c % 1000) }.toSet).toMap
    graphs.zipWithIndex.foreach { case (es, g) =>
      val want = model(es)
      assert(got.getOrElse(g.toLong, Set.empty) === want,
        s"graph $g (${es.size} edges): engine != model")
    }
  }

  test("banded candidates equal all-pairs Hamming<=radius on random " +
    "signatures — the q_media_phash oracle-equivalence claim") {
    // 4x16 banding with the radius-3 fused cut is pigeonhole-EQUIVALENT
    // to the exact all-pairs Hamming<=3 join; the persisted-phash oracle
    // relies on exactly this. Signatures: random bases, planted near
    // copies at 1-3 flips (must ALL surface) and 4-8 flips (must all be
    // cut), evaluated as one corpus in one job.
    val rnd = new scala.util.Random(4242)
    def flip(v: Long, k: Int): Long = {
      var x = v
      val bits = rnd.shuffle((0 until 64).toList).take(k)
      bits.foreach(b => x ^= (1L << b))
      x
    }
    val sigs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var id = 0L
    (0 until 120).foreach { _ =>
      val base = rnd.nextLong()
      sigs += ((id, base)); id += 1
      rnd.nextInt(3) match {
        case 0 => sigs += ((id, flip(base, 1 + rnd.nextInt(3)))); id += 1
        case 1 => sigs += ((id, flip(base, 4 + rnd.nextInt(5)))); id += 1
        case _ => ()
      }
    }
    def model: Set[(Long, Long)] = (for {
      (ia, sa) <- sigs
      (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val got = operators.Dedup.simhashCandidatesOf(
        sigs.toSeq.toDF("doc_id", "simhash"), bands = 4, bitsPerBand = 16)
      .select($"doc_id_a", $"doc_id_b").as[(Long, Long)].collect().toSet
    assert(got === model,
      s"banded != all-pairs: missing ${model -- got}, extra ${got -- model}")
    assert(model.nonEmpty, "generator planted no near pairs — vacuous run")
  }

  test("incremental CC assembly equals full CC on random graphs") {
    // the q_dedup_incr_cc / q_entity_cluster equivalence, proven on
    // random structure instead of the corpus: split each graph's edges
    // into standing/cross/delta by node id (delta = id % 10 == 0), fold
    // through incrementalCcFrom, compare against the min-reachable
    // model of full CC. 30 graphs ride one union frame (offset 1000
    // preserves id % 10), so the whole property is a few Spark jobs.
    val graphGen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.choose(4, 20)
      density <- Gen.choose(1, 3)
      edges <- Gen.listOfN(n * density,
        Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield edges.collect {
      case (a, b) if a != b =>
        (math.min(a, b).toLong, math.max(a, b).toLong)
    }.distinct
    val graphs = sample(graphGen, 30, 77L)
    val all = graphs.zipWithIndex.flatMap { case (es, g) =>
      es.map { case (a, b) => (a + g * 1000L, b + g * 1000L) }
    }
    def isDelta(x: Long) = x % 10 == 0
    val standing = all.filter { case (a, b) => !isDelta(a) && !isDelta(b) }
    val delta = all.filter { case (a, b) => isDelta(a) && isDelta(b) }
    val cross = all.collect {
      case (a, b) if isDelta(a) && !isDelta(b) => (a, b)
      case (a, b) if !isDelta(a) && isDelta(b) => (b, a)
    }
    val standingLbl = operators.GraphOps.connectedComponents(
      standing.toDF("doc_id_a", "doc_id_b"), "doc_id_a", "doc_id_b")
    val got = operators.GraphOps.incrementalCcFrom(
        standingLbl,
        cross.toDF("doc_id_a", "doc_id_b"),
        delta.toDF("doc_id_a", "doc_id_b"))
      .as[(Long, Long)].collect().toMap
    // model: full-graph min-reachable label per node
    val adj = all.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = scala.collection.mutable.Map.empty[Long, Long]
    val nodes = all.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.foreach { n =>
      if (!want.contains(n)) {
        var comp = Set(n); var frontier = Set(n)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- comp
          comp ++= frontier
        }
        val lbl = comp.min
        comp.foreach(m => want(m) = lbl)
      }
    }
    assert(got.keySet === want.keySet,
      s"domain mismatch: ${got.keySet.size} vs ${want.keySet.size} nodes")
    got.foreach { case (n, l) =>
      assert(l === want(n), s"node $n labeled $l, model says ${want(n)}")
    }
  }

  test("PQ assignment matches the brute-force nearest-centroid model") {
    val q = Tables.embeddings(spark, sf001)
      .select($"vec_id", operators.Similarity.quantize($"embedding").as("v"))
    val codebook = q.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"v".as("cv"))
    val cents = codebook.as[(Long, Seq[Long])].collect().sortBy(_._1)
    val vecs = q.filter($"vec_id" < 60).as[(Long, Seq[Long])].collect()
    def modelAssign(v: Seq[Long], m: Int): (Long, Long) = {
      // nearest centroid in subspace m, tie -> smallest cid
      val scored = cents.map { case (cid, cv) =>
        val d2 = (m * 8 until m * 8 + 8)
          .map(j => { val d = v(j) - cv(j); d * d }).sum
        (d2, cid)
      }
      scored.min
    }
    val got = operators.Similarity.pqAssign(q.filter($"vec_id" < 60), codebook)
      .select($"vec_id", $"m", $"k").as[(Long, Int, Long)].collect()
      .map { case (id, m, k) => (id, m) -> ((k / 16, k % 16)) }.toMap
    vecs.foreach { case (id, v) =>
      (0 until 8).foreach { m =>
        assert(got((id, m)) === modelAssign(v, m),
          s"vec $id subspace $m: engine != model")
      }
    }
  }
}
