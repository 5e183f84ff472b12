package graft.plans

import graft.SparkSpec

/** The injected optimizer rule must (1) rewrite every naturally-spelled
  * `levenshtein(a,b) <= k` comparison to the banded thresholded form
  * with the O(1) length guard in front, (2) change no answers, and
  * (3) leave already-thresholded and unbounded uses alone.
  */
class ThresholdLevenshteinSpec extends SparkSpec {
  import spark.implicits._

  private def optimized(sql: String): String =
    spark.sql(sql).queryExecution.optimizedPlan.toString

  private val pairs = Seq(
    ("kitten", "sitting"), // dist 3
    ("flaw", "lawn"),      // dist 2
    ("same", "same"),      // dist 0
    ("a", "abcdefgh"),     // length gap 7 — guard alone kills it
    (null.asInstanceOf[String], "x")) // null in — null out, row dropped

  // parquet-backed view: over a LocalRelation the optimizer would
  // constant-fold the whole filter away before the plan can be inspected
  private lazy val levView: Unit = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lev-pairs").toString
    pairs.toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("lev_pairs")
  }

  test("filter form rewrites to guard + banded DP and keeps answers") {
    levView
    val q = "SELECT a, b FROM lev_pairs WHERE levenshtein(a, b) <= 2"
    val p = optimized(q)
    assert(p.contains("Some(2)"), s"threshold form missing in:\n$p")
    assert(p.contains("abs"), s"length guard missing in:\n$p")
    // guard must short-circuit BEFORE the DP in the conjunction
    assert(p.indexOf("abs") < p.indexOf("levenshtein"),
      s"guard must precede the DP in:\n$p")
    val got = spark.sql(q).as[(String, String)].collect().toSet
    assert(got === Set(("flaw", "lawn"), ("same", "same")))
  }

  test("all four comparison spellings rewrite; strict < shifts k") {
    levView
    for (pred <- Seq("levenshtein(a, b) <= 2", "2 >= levenshtein(a, b)")) {
      val p = optimized(s"SELECT * FROM lev_pairs WHERE $pred")
      assert(p.contains("Some(2)"), s"[$pred] not rewritten:\n$p")
    }
    for (pred <- Seq("levenshtein(a, b) < 3", "3 > levenshtein(a, b)")) {
      val p = optimized(s"SELECT * FROM lev_pairs WHERE $pred")
      assert(p.contains("Some(2)"), s"[$pred] must band at k-1=2:\n$p")
    }
  }

  test("join-condition form rewrites in place (no cartesian filter)") {
    levView
    val q =
      """SELECT l.a, r.b FROM lev_pairs l JOIN lev_pairs r
        |  ON l.a = r.a AND levenshtein(l.a, r.b) <= 1""".stripMargin
    val p = optimized(q)
    assert(p.contains("Some(1)"), s"join condition not rewritten:\n$p")
  }

  test("left alone: negative k, already-thresholded, bare projection") {
    levView
    val neg = optimized("SELECT * FROM lev_pairs WHERE levenshtein(a, b) <= -1")
    assert(!neg.contains("Some(-1)"), s"negative k must not band:\n$neg")
    val three = optimized(
      "SELECT * FROM lev_pairs WHERE levenshtein(a, b, 5) >= 0")
    assert(three.contains("Some(5)") && !three.contains("abs"),
      s"already-thresholded form must pass through untouched:\n$three")
    val proj = optimized("SELECT levenshtein(a, b) AS d FROM lev_pairs")
    assert(!proj.contains("Some("),
      s"projection (no comparison) must not rewrite:\n$proj")
  }
}
