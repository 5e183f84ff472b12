package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** F1/F3/F5 edge cases (SURVEY §5.2): parse-total — never throws,
  * returns cents or null. */
class MoneySpec extends SparkSpec {

  private def parse(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      vs: Seq[String]): Seq[Any] = {
    import spark.implicits._
    vs.toDF("v").select(f(col("v"))).collect().map(r =>
      if (r.isNullAt(0)) null else r.getLong(0)).toSeq
  }

  test("parseCents: money strings to exact cents") {
    assert(parse(Money.parseCents, Seq(
      "$1,234.56", "-3", "0.1", "12.345", "", "junk", "$", "1.2.3", " 7 "
    )) === Seq(123456L, -300L, 10L, 1235L, null, null, null, null, 700L))
  }

  test("parseCentsLoose: strips all non-numeric (ref 02:106-152)") {
    assert(parse(Money.parseCentsLoose, Seq(
      "usd 12.34", "€9", "abc", "$1,000"
    )) === Seq(1234L, 900L, null, 100000L))
  }

  test("numericOrNull: blank-tolerant (ref revalue:238-242)") {
    import spark.implicits._
    val got = Seq("  ", "3.5", "x").toDF("v")
      .select(Money.numericOrNull(col("v")).cast("string")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got === Seq(null, "3.500000", null))
  }

  test("moneyUSDFromCents formats like the reference (F14)") {
    import spark.implicits._
    val got = Seq(1234L, 5L).toDF("c")
      .select(Money.moneyUSDFromCents(col("c"))).collect().map(_.getString(0))
    assert(got.toSeq === Seq("12.34 USD", "0.05 USD"))
  }
}
