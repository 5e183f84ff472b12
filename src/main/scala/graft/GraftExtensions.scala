package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{LongArrayDot, StringRollingHash}

/** Engine extension point, installed the documented production way:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * Registers the engine's native expressions into the session's
  * function registry so they are callable from BOTH the DataFrame API
  * (`call_function("graft_dot", a, b)`) and plain SQL. Operators probe
  * `spark.catalog.functionExists` and fall back to the equivalent
  * built-in higher-order-function form when the extension is not
  * installed, so nothing breaks in a vanilla session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "graft_dot"),
      (children: Seq[Expression]) => LongArrayDot(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[StringRollingHash].getName, "graft_fingerprint"),
      (children: Seq[Expression]) => StringRollingHash(children.head)))
  }
}
