package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd packed letter-count bag of a string: 27 saturating
  * 4-bit counters ('a'..'z' case-folded + space; all other characters
  * ignored) packed 16-per-long into `array<bigint>` of 2 longs.
  *
  * This is the per-ROW half of Navarro's bag-distance lower bound for
  * the fuzzy-match join (see [[PackedBagDistance]] for the per-PAIR
  * half and the soundness argument). The earlier higher-order-function
  * formulation of the same cut (per-row 26-element histograms via
  * `transform`/`aggregate`) fell out of whole-stage codegen and
  * allocated per pair — measured 6× SLOWER than the banded Levenshtein
  * it was meant to gate (PERF.md round-3 negative result). This
  * expression is the native form that experiment called for: the bag
  * is built once per row in a tight primitive loop, carried as two
  * longs, and the join-side comparison never allocates.
  *
  * Saturation at 15 is SOUND for the lower bound: capping a count can
  * only shrink a per-letter difference, so the derived bag distance
  * only ever under-estimates — pairs are never wrongly cut. Folding
  * case and dropping non-letters likewise only weaken the bound
  * (projection onto a sub-alphabet removes elements from both
  * multisets), never break it.
  */
case class PackedLetterBag(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_letter_bag"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h0 = 0L
    var h1 = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val idx =
        if (c >= 'a' && c <= 'z') c - 'a'
        else if (c >= 'A' && c <= 'Z') c - 'A'
        else if (c == ' ') 26
        else -1
      if (idx >= 0) {
        val shift = (idx & 15) * 4
        if (idx < 16) {
          if (((h0 >>> shift) & 15L) < 15L) h0 += 1L << shift
        } else {
          if (((h1 >>> shift) & 15L) < 15L) h1 += 1L << shift
        }
      }
      i += 1
    }
    new GenericArrayData(Array(h0, h1))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      val h0 = ctx.freshName("h0")
      val h1 = ctx.freshName("h1")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val idx = ctx.freshName("idx")
      val sh = ctx.freshName("sh")
      s"""
         |java.lang.String $s = $in.toString();
         |long $h0 = 0L; long $h1 = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  char $c = $s.charAt($i);
         |  int $idx = ($c >= 'a' && $c <= 'z') ? ($c - 'a')
         |    : ($c >= 'A' && $c <= 'Z') ? ($c - 'A')
         |    : ($c == ' ') ? 26 : -1;
         |  if ($idx >= 0) {
         |    int $sh = ($idx & 15) * 4;
         |    if ($idx < 16) {
         |      if ((($h0 >>> $sh) & 15L) < 15L) $h0 += 1L << $sh;
         |    } else {
         |      if ((($h1 >>> $sh) & 15L) < 15L) $h1 += 1L << $sh;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new long[]{$h0, $h1});
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PackedLetterBag =
    copy(child = newChild)
}

/** Native codegen'd bag distance over two [[PackedLetterBag]] values:
  * `max(Σ max(0, aᶜ−bᶜ), Σ max(0, bᶜ−aᶜ))` over the packed 4-bit
  * counters — Navarro's lower bound on edit distance (a single edit
  * changes the letter multiset by at most one element each way), so
  * `bag_dist(a, b) > k ⇒ levenshtein(a, b) > k` and the cut
  * `bag_dist ≤ k` is lossless ahead of the banded DP.
  *
  * Per pair this is two long loads and 32 shift/mask/diff steps inside
  * whole-stage codegen — no allocation, no dispatch — versus the DP's
  * O(n·k) character loop; that cost asymmetry is what makes it worth
  * running FIRST in the fused join condition.
  */
case class PackedBagDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bag_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var pos = 0L
    var neg = 0L
    var j = 0
    while (j < n) {
      val va = x.getLong(j)
      val vb = y.getLong(j)
      var s = 0
      while (s < 64) {
        val ca = (va >>> s) & 15L
        val cb = (vb >>> s) & 15L
        if (ca > cb) pos += ca - cb else neg += cb - ca
        s += 4
      }
      j += 1
    }
    math.max(pos, neg)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val pos = ctx.freshName("pos")
      val neg = ctx.freshName("neg")
      val j = ctx.freshName("j")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      val s = ctx.freshName("s")
      val ca = ctx.freshName("ca")
      val cb = ctx.freshName("cb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $pos = 0L; long $neg = 0L;
         |for (int $j = 0; $j < $n; $j++) {
         |  long $va = $a.getLong($j);
         |  long $vb = $b.getLong($j);
         |  for (int $s = 0; $s < 64; $s += 4) {
         |    long $ca = ($va >>> $s) & 15L;
         |    long $cb = ($vb >>> $s) & 15L;
         |    if ($ca > $cb) $pos += $ca - $cb; else $neg += $cb - $ca;
         |  }
         |}
         |${ev.value} = java.lang.Math.max($pos, $neg);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackedBagDistance =
    copy(left = newLeft, right = newRight)
}
