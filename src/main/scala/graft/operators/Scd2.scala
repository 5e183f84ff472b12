package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Tables

/** Slowly-changing-dimension type-2 maintenance: the warehouse pattern
  * for keeping attribute HISTORY (valid_from/valid_to row versions)
  * while the reference's upsert sinks (S7–S10) keep only latest state.
  * One merge = one full-outer join of the open rows against the
  * incoming snapshot on the business key plus map-only row
  * classification — linear, one shuffle, exactly the plan a
  * MERGE INTO compiles to on a lakehouse table; closed history rows
  * never re-join (they pass through untouched, and in a day-partitioned
  * store they would not even be read).
  */
object Scd2 {

  /** Merge an incoming snapshot into an SCD2 history frame.
    *
    * `current`: (key, attrs…, valid_from: date, valid_to: date|null) —
    * rows with null valid_to are the open versions. `incoming`:
    * (key, attrs…) — the new full snapshot, one row per key.
    * Classification per open-row/incoming pair (null-safe attr struct
    * compare, so a null attribute is a value, not a wildcard):
    * unchanged → passes through; changed → old version closes at
    * `effective`, new version opens; key absent from the snapshot →
    * soft-delete (closes at `effective`); brand-new key → opens at
    * `effective`. Closed history passes through unchanged.
    */
  def merge(current: DataFrame, incoming: DataFrame, key: String,
      attrs: Seq[String], effective: Column): DataFrame = {
    val open = current.filter(col("valid_to").isNull)
    val hist = current.filter(col("valid_to").isNotNull)
    val cAttrs = struct(attrs.map(a => col(s"c.$a")): _*)
    val iAttrs = struct(attrs.map(a => col(s"i.$a")): _*)
    val j = open.alias("c").join(incoming.alias("i"),
      col(s"c.$key") === col(s"i.$key"), "full_outer")
    val inCur = col(s"c.$key").isNotNull
    val inNew = col(s"i.$key").isNotNull
    val same = cAttrs <=> iAttrs
    val curCols = (key +: attrs).map(a => col(s"c.$a")) :+
      col("c.valid_from") :+ col("c.valid_to")
    val unchanged = j.filter(inCur && inNew && same).select(curCols: _*)
    val closed = j.filter(inCur && (!inNew || !same))
      .select((key +: attrs).map(a => col(s"c.$a")) :+
        col("c.valid_from") :+ effective.as("valid_to"): _*)
    val opened = j.filter(inNew && (!inCur || !same))
      .select((key +: attrs).map(a => col(s"i.$a")) :+
        effective.as("valid_from") :+ lit(null).cast("date").as("valid_to"): _*)
    hist.unionByName(unchanged).unionByName(closed).unionByName(opened)
  }

  /** SCD2 merge registered end-to-end on a deterministic change batch:
    * day-0 history is the customer snapshot (all rows open from
    * 2024-01-01); the day-30 snapshot mutates every 7th customer's
    * market segment (the piiScrub decoy pattern — the same injection
    * runs in the oracle, so the merge kernel itself is what's under
    * test). Changed keys must close their old version and open a new
    * one; everyone else stays a single open row. */
  val scd2Merge: Op = Op(
    "q_scd2_merge",
    """SELECT c_custkey, c_mktsegment AS segment,
      |       DATE '2024-01-01' AS valid_from,
      |       CASE WHEN c_custkey % 7 = 0 THEN DATE '2024-02-01' END AS valid_to,
      |       c_custkey % 7 <> 0 AS is_current
      |FROM customer
      |UNION ALL
      |SELECT c_custkey, 'CHANGED', DATE '2024-02-01', NULL, TRUE
      |FROM customer WHERE c_custkey % 7 = 0""".stripMargin) { (spark, dir) =>
    val snap = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    val day0 = snap
      .withColumn("valid_from", to_date(lit("2024-01-01")))
      .withColumn("valid_to", lit(null).cast("date"))
    val day30 = snap.select(col("c_custkey"),
      when(col("c_custkey") % 7 === 0, "CHANGED")
        .otherwise(col("segment")).as("segment"))
    merge(day0, day30, "c_custkey", Seq("segment"),
      to_date(lit("2024-02-01")))
      .select(col("c_custkey"), col("segment"), col("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }
}
