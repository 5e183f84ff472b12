package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Money.centsOf

/** Collection revalue (reference scripts/revalue/revalueCollection.mjs):
  * the app-side Map join becomes a broadcast hash join (J3), the per-game
  * price tables become a tagged union (U3), the per-user JS accumulators
  * become one grouped aggregation (A2) with the reference's null-money
  * rules (null price ⇒ contributes 0 to value but still counts in
  * quantity/cost — revalueCollection.mjs:96-102).
  *
  * Role mapping: lineitem⋈orders = user_collection_items (user =
  * o_custkey), part = vendor price table; parts with p_size > 25 are
  * deliberately "unpriced" to exercise the null rule.
  *
  * Scale notes: the price dimension is ~0.2% the size of the item fact —
  * `broadcast()` pins a broadcast hash join, so the big side never
  * shuffles for the join; the only full shuffle is the final groupBy
  * user_id, which is partial-aggregated map-side first. The reference did
  * this whole join+aggregate in driver memory (revalue:62-103) — the one
  * thing that cannot survive 100 TB.
  */
object Revalue {

  val revalueUsers: Op = Op(
    "q_revalue_users",
    """WITH prices AS (
      |  SELECT p_partkey AS card_id,
      |         CAST(ROUND(p_retailprice*100) AS BIGINT) AS price_cents
      |  FROM part WHERE p_size <= 25
      |), items AS (
      |  SELECT o_custkey AS user_id, l_partkey AS card_id,
      |         CAST(l_quantity AS BIGINT) AS quantity,
      |         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cost_cents
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |)
      |SELECT user_id,
      |       CAST(SUM(quantity) AS BIGINT) AS total_quantity,
      |       COUNT(*) AS distinct_items,
      |       CAST(SUM(cost_cents * quantity) AS BIGINT) AS total_cost_cents,
      |       CAST(SUM(COALESCE(price_cents, 0) * quantity) AS BIGINT) AS total_value_cents
      |FROM items LEFT JOIN prices USING (card_id)
      |GROUP BY user_id""".stripMargin) { (spark, dir) =>
    val prices = Tables.part(spark, dir)
      .filter(col("p_size") <= 25)
      .select(col("p_partkey").as("card_id"),
        centsOf(col("p_retailprice")).as("price_cents"))
    val items = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("user_id"),
        col("l_partkey").as("card_id"),
        col("l_quantity").cast("long").as("quantity"),
        centsOf(col("l_extendedprice")).as("cost_cents"))
    items.join(broadcast(prices), Seq("card_id"), "left")
      .groupBy(col("user_id"))
      .agg(
        sum(col("quantity")).as("total_quantity"),
        count(lit(1)).as("distinct_items"),
        sum(col("cost_cents") * col("quantity")).as("total_cost_cents"),
        sum(coalesce(col("price_cents"), lit(0L)) * col("quantity"))
          .as("total_value_cents"))
  }

  /** U3: tagged union of per-game sources then one pass (ref
    * revalueCollection.mjs:50-54,279-290 — three vendor Maps dispatched
    * by `game` become unionByName + a single downstream plan). Union is
    * plan-level only — no shuffle, each leg scans in parallel.
    */
  val unionTagged: Op = Op(
    "q_union_tagged",
    """WITH unioned AS (
      |  SELECT 'pokemon' AS game, l_partkey AS card_id,
      |         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_cents
      |  FROM lineitem WHERE l_returnflag = 'R'
      |  UNION ALL
      |  SELECT 'yugioh', l_partkey, CAST(ROUND(l_extendedprice*100) AS BIGINT)
      |  FROM lineitem WHERE l_returnflag = 'A'
      |  UNION ALL
      |  SELECT 'mtg', l_partkey, CAST(ROUND(l_extendedprice*100) AS BIGINT)
      |  FROM lineitem WHERE l_returnflag = 'N'
      |)
      |SELECT game, COUNT(*) AS n, COUNT(DISTINCT card_id) AS n_cards,
      |       CAST(SUM(price_cents) AS BIGINT) AS sum_cents
      |FROM unioned GROUP BY game""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    def leg(game: String, flag: String) =
      li.filter(col("l_returnflag") === flag).select(
        lit(game).as("game"),
        col("l_partkey").as("card_id"),
        centsOf(col("l_extendedprice")).as("price_cents"))
    leg("pokemon", "R")
      .unionByName(leg("yugioh", "A"))
      .unionByName(leg("mtg", "N"))
      .groupBy(col("game"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("card_id")).as("n_cards"),
        sum(col("price_cents")).as("sum_cents"))
  }
}
