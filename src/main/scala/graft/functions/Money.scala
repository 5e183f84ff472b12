package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Money-parsing kernel.
  *
  * Reference semantics (cited into /root/reference):
  *  - `centsFromMoney` — scripts/pricing/01_import_pricecharting_csv.js:78-90:
  *    strip `$`/`,`, validate `^-?\d+(\.\d+)?$`, ×100, round; NULL on junk.
  *  - SQL money-from-JSON — scripts/pricing/02_normalize_scryfall_prices.js:106-152:
  *    `NULLIF(regexp_replace(x,'[^0-9.\-]','','g'),'')::numeric * 100 → int`.
  *  - `NULLIF(TRIM(x),'')::numeric` — scripts/revalue/revalueCollection.mjs:238-242.
  *
  * All parsing goes through decimal (never double) so cents are exact; a
  * regex guard makes the cast total (junk → NULL, never a runtime error),
  * which is what you want on 100 TB of dirty vendor strings — one bad row
  * must not kill a 10k-task stage.
  */
object Money {

  private val NumericRe = "^-?[0-9]+(\\.[0-9]+)?$"

  /** Strict money string → integer cents (`$1,234.56` → 123456L; junk → null). */
  def parseCents(c: Column): Column = {
    val cleaned = regexp_replace(trim(c), "[$,]", "")
    when(cleaned.rlike(NumericRe),
      round(cleaned.cast("decimal(18,6)") * 100).cast("long"))
  }

  /** Lenient variant: strip everything non-numeric first (ref 02:106-152). */
  def parseCentsLoose(c: Column): Column = {
    val cleaned = nullif(regexp_replace(c, "[^0-9.\\-]", ""), lit(""))
    when(cleaned.rlike(NumericRe),
      round(cleaned.cast("decimal(18,6)") * 100).cast("long"))
  }

  /** Blank-tolerant numeric parse (ref revalueCollection.mjs:238-242). */
  def numericOrNull(c: Column): Column = {
    val cleaned = nullif(trim(c), lit(""))
    when(cleaned.rlike(NumericRe), cleaned.cast("decimal(18,6)"))
  }

  /** Regex-guarded text→numeric (ref revalueCollection.mjs:196-200, P6). */
  def guardedDecimal(c: Column): Column =
    when(c.rlike(NumericRe), c.cast("decimal(12,2)"))

  /** Cents → `"12.34 USD"` (ref exportGoogleMerchantFeed.mjs:78-82, F14). */
  def moneyUSDFromCents(cents: Column): Column =
    format_string("%.2f USD", cents.cast("double") / 100)

  /** Exact double→cents used for testdata role-mapping: both Spark and the
    * DuckDB oracle compute `CAST(ROUND(x*100) AS BIGINT)` — IEEE-identical. */
  def centsOf(c: Column): Column = round(c * 100).cast("long")
}
