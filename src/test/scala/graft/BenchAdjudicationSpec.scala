package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench steal-guard's decision law (r11 verdict #2): the
  * dispersion-aware thresholds and the final SOLO adjudication sweep
  * that separates "contended while measured" from "regressed" inside
  * the artifact itself — round 11 shipped q_knn_graph 8.68 s suspect
  * (median 0.93) and only a manual solo re-run (0.977 s) showed it was
  * host steal. Synthetic contention demonstration: the solo timer
  * returns a clean time for the contended query and a still-slow time
  * for the genuinely regressed one.
  */
class BenchAdjudicationSpec extends AnyFunSuite {

  test("threshold laws: dispersion-aware with sub-200ms floors") {
    // median dominates when it is the larger bound
    assert(Bench.rerunThreshold(1.0, 2.0) === 2.6)
    assert(Bench.suspectThreshold(1.0, 2.0) === 3.0)
    // the +100/+150 ms floors keep sub-100 ms queries from thrashing
    // (tolerance: 1.3*0.05+0.1 is not exactly representable)
    assert(math.abs(Bench.rerunThreshold(0.05, 0.05) - 0.165) < 1e-12)
    assert(math.abs(Bench.suspectThreshold(0.05, 0.05) - 0.225) < 1e-12)
  }

  test("adjudication: a contended suspect clears on its solo pass, a " +
    "genuine regression stays suspect (the r11 q_knn_graph shape)") {
    val prior = Map(
      "q_contended" -> (0.932, 0.932), // r11's q_knn_graph dispersion
      "q_regressed" -> (1.0, 1.0))
    val soloTimes = Map(
      "q_contended" -> 0.977, // judge's solo re-run: inside threshold
      "q_regressed" -> 4.0) // still 4× median solo: real
    var soloRuns = List.empty[String]
    val (adjudicated, still) = Bench.adjudicate(
      List("q_contended", "q_regressed"), prior,
      n => { soloRuns ::= n; soloTimes(n) })
    // every suspect got exactly one solo adjudication run
    assert(soloRuns.toSet === Set("q_contended", "q_regressed"))
    assert(adjudicated === soloTimes)
    assert(still === List("q_regressed"))
  }

  test("adjudication with no suspects is a no-op") {
    val (adjudicated, still) = Bench.adjudicate(Nil, Map.empty,
      _ => fail("solo timer must not run without suspects"))
    assert(adjudicated.isEmpty && still.isEmpty)
  }

  test("a failed solo pass (recorded as Double.MaxValue by the " +
    "failed-query guard, ADVICE r12) can never clear the flag or win " +
    "a math.min against the loop time") {
    val (adjudicated, still) = Bench.adjudicate(List("q_died"),
      Map("q_died" -> (1.0, 1.0)), _ => Double.MaxValue)
    assert(still === List("q_died"))
    // main() drops MaxValue entries from the artifact's adjudicated
    // map, so the corrupted time never replaces the recorded one
    assert(adjudicated("q_died") === Double.MaxValue)
  }

  test("a suspect with no prior cannot stay suspect (nothing to " +
    "compare against), but its solo time is still recorded") {
    val (adjudicated, still) =
      Bench.adjudicate(List("q_new"), Map.empty, _ => 9.9)
    assert(adjudicated === Map("q_new" -> 9.9))
    assert(still.isEmpty)
  }
}
