package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound every un-thresholded `levenshtein(a, b) <= k`
  * comparison (reference shape: the pc_matcher fuzzy lookup,
  * scripts/pricing/02_normalize_scryfall_prices.js:118-131, which runs
  * an unbounded editdist3 per candidate row).
  *
  * A plain `levenshtein(a, b) <= k` evaluates the full O(|a|·|b|) DP
  * and only then compares — on a fuzzy join's candidate loop that DP is
  * the hot path. For a fixed literal k the same predicate is
  *
  * {{{ abs(length(a) - length(b)) <= k  AND  levenshtein(a, b, k) >= 0 }}}
  *
  * because (1) edit distance is lower-bounded by the length difference,
  * and (2) Spark's three-argument levenshtein runs the Ukkonen-banded
  * O(k·min(|a|,|b|)) DP that early-exits to -1 the moment the distance
  * provably exceeds k. The guard is O(1) and short-circuits the DP
  * entirely for most candidate pairs; `And` evaluates left-to-right in
  * the generated loop, so conjunct order is load-bearing (the same
  * lesson PlanQualitySpec pins for the hand-fused fuzzy ops).
  *
  * Null semantics are preserved exactly: any null operand makes both
  * the original predicate and each rewritten conjunct null. The rule is
  * fixpoint-safe by construction — the rewritten form carries a
  * three-argument levenshtein, which no pattern here matches — and runs
  * in the user-provided batch AFTER predicate pushdown, so the rewritten
  * conjuncts stay where the original predicate landed (join condition
  * or filter) and keep their short-circuit order.
  *
  * Installed by [[graft.GraftExtensions]] via `injectOptimizerRule`;
  * the hand-tuned fuzzy ops (Dedup.fuzzyMatch/fuzzyBest) already write
  * the thresholded form plus the tighter bag-distance cut and are
  * untouched. This rule is for every OTHER query — ad-hoc SQL included
  * — that spells the predicate the natural way.
  */
object ThresholdLevenshtein extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.BINARY_COMPARISON)) {
      // levenshtein(a,b) <= k  /  k >= levenshtein(a,b)
      case LessThanOrEqual(Levenshtein(a, b, None), k @ IntLit(kv)) if kv >= 0 =>
        rewrite(a, b, k)
      case GreaterThanOrEqual(k @ IntLit(kv), Levenshtein(a, b, None)) if kv >= 0 =>
        rewrite(a, b, k)
      // levenshtein(a,b) < k  /  k > levenshtein(a,b)   (≡ ... <= k-1)
      case LessThan(Levenshtein(a, b, None), IntLit(kv)) if kv >= 1 =>
        rewrite(a, b, Literal(kv - 1))
      case GreaterThan(IntLit(kv), Levenshtein(a, b, None)) if kv >= 1 =>
        rewrite(a, b, Literal(kv - 1))
    }

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }

  private def rewrite(a: Expression, b: Expression, k: Expression): Expression = {
    val lengthGuard =
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)
    val bandedDp =
      GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0))
    And(lengthGuard, bandedDp)
  }
}
