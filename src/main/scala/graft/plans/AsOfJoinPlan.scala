package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join — the whole-operator Catalyst extension tier
  * (north-star; the reference's closest shape is the correlated
  * LIMIT-1 lookup, scripts/pricing/10_rollup_market_values_daily.mjs:69-75).
  *
  * Semantics: LEFT OUTER point-in-time join. With `forward = false`
  * (the default, pandas merge_asof direction='backward'), every `left`
  * (probe) row is paired with the single `right` (state) row that has
  * an equal key and the greatest time at-or-before the probe's time;
  * ties on equal (key, time) resolve to the greatest `rightTieBreak`
  * tuple. With `forward = true` (direction='forward'), the match is
  * the smallest time at-or-after the probe's time, ties to the
  * SMALLEST tie-break tuple — in both directions the closest row wins
  * and the tie order makes the match total and deterministic. Probe
  * rows with no eligible state row pad the state side with nulls.
  *
  * Key equality is GROUPING equality (null keys match null keys),
  * identical to the `Window.partitionBy` carry-forward twin
  * [[graft.operators.AsOf.asofJoin]]; times order nulls-first, so a
  * null state time is "before" every real time.
  *
  * The node is built from already-analyzed children with resolved
  * attributes, so the analyzer accepts it untouched; the planner turns
  * it into [[AsOfJoinExec]] via [[GraftAsOfStrategy]].
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    forward: Boolean = false) extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs at least one equi-key pair")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match pairwise")
  require(leftTime.dataType == rightTime.dataType,
    "as-of join time columns must share a type")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
