package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The reference's REAL transactional write pairs through TxStore:
  * revalue's item-values upsert + day-valuations day-partition upsert in
  * ONE commit (revalueCollection.mjs:105-179), and the snapshot-update +
  * normalized-insert shape (02_normalize_scryfall_prices.js:195-209).
  * Crash injection between the pair's two writes must expose nothing.
  */
class TxStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val root = s"/tmp/graft-txstore-$tag"
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    root
  }

  private def items(rows: (Long, Long)*) = rows.toSeq.toDF("item_id", "cents")
  private def days(rows: (String, Long)*) = rows.toSeq
    .toDF("d", "total_cents").select(to_date($"d").as("as_of_date"),
      $"total_cents")

  /** The revalue pair as one transaction: item-values keyed upsert +
    * day-valuations delete-then-insert, atomically. */
  private def revalueTxn(root: String, itemRows: Seq[(Long, Long)],
      dayRows: Seq[(String, Long)]): Long =
    TxStore.transact(spark, root) { txn =>
      TxStore.stageKeyed(spark, txn, "item_values",
        items(itemRows: _*), Seq("item_id")) ++
        TxStore.stageDays(txn, days(dayRows: _*), "as_of_date",
          prefix = "day_valuations")
    }

  private def readPair(root: String): (Set[(Long, Long)], Set[(String, Long)]) = {
    val iv = TxCommit.read(spark, root, "item_values")
      .as[(Long, Long)].collect().toSet
    val dv = TxStore.readDays(spark, root, "day_valuations")
      .select($"as_of_date".cast("string"), $"total_cents")
      .as[(String, Long)].collect().toSet
    (iv, dv)
  }

  test("revalue pair commits atomically: items + day valuations in one version") {
    val root = freshRoot("pair")
    val v1 = revalueTxn(root,
      Seq(1L -> 100L, 2L -> 200L),
      Seq("2024-01-01" -> 300L))
    assert(v1 === 1L)
    val (iv, dv) = readPair(root)
    assert(iv === Set(1L -> 100L, 2L -> 200L))
    assert(dv === Set("2024-01-01" -> 300L))
    // both outputs resolve through ONE committed manifest version
    val m = TxCommit.latest(spark, root)
    assert(m.keySet === Set("item_values", "day_valuations/2024-01-01"))
  }

  test("crash between the pair's writes exposes nothing; re-run completes the pair") {
    val root = freshRoot("crash")
    revalueTxn(root, Seq(1L -> 100L), Seq("2024-01-01" -> 100L))
    // crash injection: the day write lands in staging, then the process
    // dies before the item write / commit
    intercept[RuntimeException] {
      TxStore.transact(spark, root) { txn =>
        val staged = TxStore.stageDays(txn,
          days("2024-01-01" -> 999L, "2024-01-02" -> 999L), "as_of_date",
          prefix = "day_valuations")
        assert(staged.nonEmpty)
        throw new RuntimeException("crash between the pair's writes")
      }
    }
    // readers still see the v1 pair — no poisoned day, no half pair
    val (iv, dv) = readPair(root)
    assert(iv === Set(1L -> 100L))
    assert(dv === Set("2024-01-01" -> 100L))
    // recovery re-run commits the full corrected pair
    revalueTxn(root, Seq(1L -> 150L), Seq("2024-01-01" -> 150L))
    val (iv2, dv2) = readPair(root)
    assert(iv2 === Set(1L -> 150L))
    assert(dv2 === Set("2024-01-01" -> 150L))
  }

  test("day upsert carries unchanged days forward (partition-level copy-on-write)") {
    val root = freshRoot("carry")
    revalueTxn(root, Seq(1L -> 1L),
      Seq("2024-01-01" -> 10L, "2024-01-02" -> 20L))
    // second txn re-stages ONLY Jan 2 (+ Jan 3); Jan 1 must carry forward
    revalueTxn(root, Seq(1L -> 2L),
      Seq("2024-01-02" -> 21L, "2024-01-03" -> 30L))
    val (_, dv) = readPair(root)
    assert(dv === Set("2024-01-01" -> 10L, "2024-01-02" -> 21L,
      "2024-01-03" -> 30L))
    // Jan 1's manifest entry still points at the FIRST version's staging
    // (it was never rewritten), Jan 2's at the second's
    val m = TxCommit.latest(spark, root)
    assert(m("day_valuations/2024-01-01").contains("v00000001"))
    assert(m("day_valuations/2024-01-02").contains("v00000002"))
  }

  test("keyed upsert merges against committed state with incoming-wins semantics") {
    val root = freshRoot("keyed")
    TxStore.transact(spark, root) { txn =>
      TxStore.stageFull(txn, "prices", items(1L -> 100L, 2L -> 200L))
    }
    TxStore.transact(spark, root) { txn =>
      TxStore.stageKeyed(spark, txn, "prices",
        items(2L -> 222L, 3L -> 333L), Seq("item_id"))
    }
    val got = TxCommit.read(spark, root, "prices")
      .as[(Long, Long)].collect().toSet
    assert(got === Set(1L -> 100L, 2L -> 222L, 3L -> 333L))
    // time travel: v1 still resolvable pre-vacuum
    val v1 = TxCommit.manifest(spark, root, 1L)("prices")
    assert(spark.read.parquet(v1).as[(Long, Long)].collect().toSet ===
      Set(1L -> 100L, 2L -> 200L))
  }
}
