package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import Money.{guardedDecimal, numericOrNull}

/** Vendor price fallback chains (reference F4,
  * scripts/revalue/revalueCollection.mjs):
  *
  *  - pokemon (revalue:190-203): `market_price` numeric, else `mid_price`,
  *    else the first regex-valid variant TEXT column in fixed order
  *    normal → reverse_holofoil → holofoil → first_edition_holofoil →
  *    first_edition_normal (numerics stored as strings, each gated by
  *    `~ '^[0-9]+(\.[0-9]+)?$'` before the cast — revalue:196-200).
  *  - yugioh (revalue:234-245): 5-vendor chain tcgplayer → cardmarket →
  *    amazon → coolstuffinc → ebay, each `NULLIF(TRIM(x),'')::numeric`.
  *  - mtg (revalue:258-264): a single effective-usd column passthrough.
  *
  * All chains return integer CENTS (`ROUND(x*100)` — revalue:72) so
  * downstream accumulators stay exact at any scale.
  */
object PriceChains {

  private def cents(x: Column): Column = round(x * 100).cast("long")

  /** Pokemon chain: numeric market/mid, then regex-guarded variant texts. */
  def pokemonEffectiveCents(
      marketPrice: Column, midPrice: Column,
      variantTexts: Seq[Column]): Column =
    cents(coalesce(
      marketPrice.cast("decimal(12,4)") +:
        midPrice.cast("decimal(12,4)") +:
        variantTexts.map(guardedDecimal): _*))

  /** The reference's fixed pokemon variant order (revalue:193-201). */
  val PokemonVariantOrder: Seq[String] = Seq(
    "normal", "reverse_holofoil", "holofoil",
    "first_edition_holofoil", "first_edition_normal")

  /** Yu-Gi-Oh chain: blank-tolerant text numerics, 5 vendors in order. */
  def ygoEffectiveCents(vendorTexts: Seq[Column]): Column =
    cents(coalesce(vendorTexts.map(numericOrNull): _*))

  /** The reference's fixed ygo vendor order (revalue:237-242). */
  val YgoVendorOrder: Seq[String] = Seq(
    "tcgplayer_price", "cardmarket_price", "amazon_price",
    "coolstuffinc_price", "ebay_price")
}
