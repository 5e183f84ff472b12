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
}
