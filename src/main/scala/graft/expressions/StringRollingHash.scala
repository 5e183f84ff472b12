package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd rolling-hash fingerprint over a string column:
  * fold over code points of `(acc*31 + codepoint) % 1000000007`, acc₀=0
  * — the engine's deterministic content fingerprint
  * ([[graft.functions.TextAnalysis.fingerprint]]).
  *
  * The built-in form (`aggregate(transform(split(text, ''), ascii), …)`)
  * is semantically identical but evaluates interpretively: `split`
  * materializes a one-element-per-character array, and every character
  * costs two closure dispatches with boxed longs. At 100 TB that is the
  * difference between hashing bytes at memory speed and allocating an
  * object per character of the corpus. This expression walks the
  * string's code points in a tight primitive loop inside whole-stage
  * codegen — preference order per SURVEY §2.9: built-in first, native
  * `Expression` where the built-in shape is the bottleneck, UDF never.
  *
  * Semantics pinned to the built-in form: Spark's `split(text, '')`
  * yields CODE POINTS (surrogate pairs stay whole) and `ascii` returns
  * the full code point (verified against `ascii('中')=20013`,
  * `ascii('𝄞')=119070`); the empty string hashes to 0 both ways
  * (`split('','')=['']` and `ascii('')=0` ⇒ `(0*31+0)%M = 0` = the
  * empty fold). DuckDB's `ascii` is also code-point-valued, so the SQL
  * oracle twins keep matching byte-for-byte. Equivalence with the
  * built-in form is property-tested over unicode inputs
  * (StringRollingHashSpec).
  */
case class StringRollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $in.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); ) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): StringRollingHash =
    copy(child = newChild)
}
