package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** fx_user_collection_items (FIXTURES.md §B) — the reference's null-money
  * rules (revalueCollection.mjs:96-102, SURVEY §7.4 hard spot 2):
  * unpriced item contributes 0 to value but still counts in quantity and
  * items; null cost excluded from the cost sum; quantity 0 rows legal.
  */
class RevalueSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("null price → 0 value, still counted; null cost excluded") {
    val items = Seq(
      ("u1", "c1", 2, Option(100L)),  // priced (c1)
      ("u1", "c2", 3, Option(50L)),   // UNpriced card
      ("u1", "c3", 1, None: Option[Long]), // null cost, priced
      ("u2", "c9", 0, Option(10L))    // zero quantity
    ).toDF("user_id", "card_id", "quantity", "cost_cents")
    val prices = Seq(("c1", 500L), ("c3", 700L)).toDF("card_id", "price_cents")
    val got = items.join(broadcast(prices), Seq("card_id"), "left")
      .groupBy($"user_id").agg(
        sum($"quantity").as("total_quantity"),
        count(lit(1)).as("distinct_items"),
        sum(coalesce($"cost_cents", lit(0L)) * $"quantity").as("total_cost_cents"),
        sum(coalesce($"price_cents", lit(0L)) * $"quantity").as("total_value_cents"))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      // u1: qty 2+3+1; items 3; cost 2*100+3*50(+0 for null); value 2*500+0+1*700
      ("u1", 6L, 3L, 350L, 1700L),
      ("u2", 0L, 1L, 0L, 0L)))
  }
}
