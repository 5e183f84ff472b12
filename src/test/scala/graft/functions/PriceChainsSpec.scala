package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reference-shaped fixtures for the vendor price chains
  * (revalueCollection.mjs:190-245): fallback order, regex gating of
  * text numerics, blank tolerance, and the null-everything case.
  */
class PriceChainsSpec extends SparkSpec {
  import spark.implicits._

  test("pokemon chain: market beats mid beats variants; junk text skipped") {
    val rows = Seq(
      // market wins even when everything else is set
      (1L, Some(5.00), Some(9.00), "1.00", "2.00"),
      // no market → mid
      (2L, None, Some(7.50), "1.00", "2.00"),
      // no numerics → first VALID variant in order (normal first)
      (3L, None, None, "3.25", "4.00"),
      // junk normal → falls through to reverse_holofoil
      (4L, None, None, "N/A", "4.75"),
      // junk + blank everywhere → null
      (5L, None, None, "", "garbage")
    ).toDF("id", "market_price", "mid_price", "normal", "reverse_holofoil")
    val got = rows.select($"id",
      PriceChains.pokemonEffectiveCents(
        $"market_price", $"mid_price",
        Seq($"normal", $"reverse_holofoil")).as("cents"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(
      1L -> Some(500L), 2L -> Some(750L), 3L -> Some(325L),
      4L -> Some(475L), 5L -> None))
  }

  test("ygo chain: blank-tolerant vendor order") {
    val rows = Seq(
      (1L, " 12.34 ", "", "9.99"),   // tcgplayer wins, whitespace trimmed
      (2L, "", "  ", "3.00"),        // blanks skipped → amazon
      (3L, "", "", "")               // all blank → null
    ).toDF("id", "tcgplayer_price", "cardmarket_price", "amazon_price")
    val got = rows.select($"id",
      PriceChains.ygoEffectiveCents(
        Seq($"tcgplayer_price", $"cardmarket_price", $"amazon_price")).as("cents"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(1L -> Some(1234L), 2L -> Some(300L), 3L -> None))
  }
}
