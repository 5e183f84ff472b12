package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native bag-distance cut of the fuzzy-match join: packed
  * histograms, the lower-bound property that makes the cut lossless,
  * saturation soundness, and the candidate-volume reduction per brand
  * block that justifies its existence. */
class PackedLetterBagSpec extends SparkSpec {
  import spark.implicits._

  test("graft_letter_bag / graft_bag_dist registered, SQL and API agree") {
    assert(spark.catalog.functionExists("graft_letter_bag"))
    assert(spark.catalog.functionExists("graft_bag_dist"))
    val df = Seq(("abc", "abd"), ("kitten", "sitting"), ("", "xyz"))
      .toDF("a", "b")
    val api = df.select(call_function("graft_bag_dist",
        call_function("graft_letter_bag", $"a"),
        call_function("graft_letter_bag", $"b")).as("d"))
      .as[Long].collect().toSeq
    df.createOrReplaceTempView("bag_fixture")
    val sql = spark.sql(
      """SELECT graft_bag_dist(graft_letter_bag(a), graft_letter_bag(b)) AS d
        |FROM bag_fixture""".stripMargin).as[Long].collect().toSeq
    assert(api === sql)
    // abc→abd: one substitution = bag {c}/{d} → distance 1
    // kitten→sitting: bags differ by {e,k}/{g,i,s} → max(2,3) = 3
    // ""→xyz: 3 insertions
    assert(api === Seq(1L, 3L, 3L))
  }

  test("bag distance lower-bounds levenshtein on adversarial strings") {
    // includes: case folds (bag is case-insensitive, levenshtein is not
    // — folding only weakens the bound), ignored characters (digits,
    // punctuation), saturation (>15 repeats of one letter), spaces
    // (counted as the 27th symbol), and plain word pairs
    val pairs = Seq(
      ("abc", "abd"), ("kitten", "sitting"), ("", ""), ("", "abcdef"),
      ("ABC", "abc"), ("a1b2c3", "abc!!!"),
      ("a" * 20, "a" * 3), ("a" * 20 + "b", "a" * 20 + "c"),
      ("navy mint linen", "navy mint linern"),
      ("the quick brown fox", "the quick brown fax"),
      ("zz zz zz", "zzzzzz"))
    val checked = pairs.toDF("a", "b").select(
      call_function("graft_bag_dist",
        call_function("graft_letter_bag", $"a"),
        call_function("graft_letter_bag", $"b")).as("bag"),
      levenshtein($"a", $"b").as("lev"))
      .as[(Long, Int)].collect()
    checked.foreach { case (bag, lev) =>
      assert(bag <= lev, s"bag $bag must lower-bound levenshtein $lev")
    }
  }

  test("bag cut is lossless on the part corpus: fuzzy matches identical with and without it") {
    // without the bag cut: the original two-cut join (length band + DP)
    val p = graft.Tables.part(spark, sf001)
    val a = p.select($"p_brand".as("brand"), $"p_partkey".as("key_a"),
      $"p_name".as("name_a"))
    val b = p.select($"p_brand".as("brand"), $"p_partkey".as("key_b"),
      $"p_name".as("name_b"))
    val noBag = a.join(b,
        a("brand") === b("brand") && $"key_a" < $"key_b" &&
          abs(length($"name_a") - length($"name_b")) <= graft.operators.Dedup.FuzzyMaxDist &&
          levenshtein($"name_a", $"name_b", graft.operators.Dedup.FuzzyMaxDist) =!= -1)
      .select(a("brand"), $"key_a", $"key_b")
      .as[(String, Long, Long)].collect().toSet
    val withBag = graft.operators.Dedup.fuzzyMatch.build(spark, sf001)
      .select($"brand", $"key_a", $"key_b")
      .as[(String, Long, Long)].collect().toSet
    assert(noBag.nonEmpty)
    assert(withBag === noBag)
  }

  test("candidate volume: the fused cuts keep candidates well below brand-block pairs") {
    val cands = graft.operators.Dedup.fuzzyCandidates(spark, sf001).count()
    val blockPairs = graft.Tables.part(spark, sf001)
      .groupBy($"p_brand").count()
      .select(sum($"count" * ($"count" - 1))).as[Long].head() / 2
    assert(cands > 0)
    assert(cands * 4 <= blockPairs,
      s"candidates $cands not ≪ brand-block pairs $blockPairs")
  }
}
