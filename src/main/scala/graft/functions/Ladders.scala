package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Priority-ladder expressions (reference W2/W3).
  *
  * The reference ranks a day's candidate prices by vendor priority then
  * price-type priority (scripts/pricing/03_build_market_price_daily.js:120-145)
  * as chained CASE expressions — kept as expressions here too (not a lookup
  * join): Catalyst constant-folds them and they stay inside whole-stage
  * codegen, so at 100 TB the ladder costs zero extra shuffles.
  */
object Ladders {

  /** Generic CASE ladder: value → priority, with a default. */
  def ladder(c: Column, prio: Seq[(String, Int)], default: Int): Column =
    prio.foldLeft(None: Option[Column]) { case (acc, (v, p)) =>
      Some(acc.fold(when(c === v, p))(_.when(c === v, p)))
    }.fold(lit(default))(_.otherwise(default))

  /** Vendor priority (ref 03_build_market_price_daily.js:120-128). */
  val sourceLadder: Seq[(String, Int)] = Seq(
    "tcgplayer" -> 10, "scryfall" -> 20, "cardmarket" -> 30,
    "pricecharting" -> 40, "ebay" -> 50, "amazon" -> 60)

  def sourcePriority(c: Column): Column = ladder(c, sourceLadder, 99)

  /** Price-type priority (ref 03_build_market_price_daily.js:129-145). */
  val priceTypeLadder: Seq[(String, Int)] = Seq(
    "market" -> 10, "trend" -> 12, "mid" -> 14, "avg_7d" -> 16,
    "avg_30d" -> 18, "low" -> 22, "high" -> 24, "loose" -> 30,
    "cib" -> 32, "new" -> 34, "graded" -> 36, "foil" -> 60,
    "etched" -> 62, "tix" -> 80)

  def priceTypePriority(c: Column): Column = ladder(c, priceTypeLadder, 90)

  /** Count-bucketed confidence grade (ref 10_rollup_market_values_daily.mjs:78-83). */
  def confidenceGrade(cnt: Column): Column =
    when(cnt >= 10, "A").when(cnt >= 5, "B").when(cnt >= 2, "C").otherwise("D")

  /** Same ladders as ANSI SQL CASE text, so oracle SQL provably mirrors
    * the DataFrame expression (SURVEY §7.1 "provably parallel"). */
  def ladderSql(col: String, prio: Seq[(String, Int)], default: Int): String =
    prio.map { case (v, p) => s"WHEN '$v' THEN $p" }
      .mkString(s"CASE $col ", " ", s" ELSE $default END")
}
