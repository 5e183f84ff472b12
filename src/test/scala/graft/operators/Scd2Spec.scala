package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 merge semantics beyond the registered query's change-only batch:
  * new keys, soft deletes, null-attribute compares, and merge
  * idempotency on an unchanged snapshot. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val eff = to_date(lit("2024-02-01"))

  private def hist(rows: Seq[(Long, String, String, Option[String])]) =
    rows.toDF("k", "seg", "vf", "vt")
      .select(col("k"), col("seg"), to_date(col("vf")).as("valid_from"),
        to_date(col("vt")).as("valid_to"))

  test("new key opens, missing key soft-deletes, changed key versions") {
    val current = hist(Seq(
      (1L, "A", "2024-01-01", None),     // unchanged
      (2L, "B", "2024-01-01", None),     // will change to B2
      (3L, "C", "2024-01-01", None)))    // absent from snapshot → closes
    val incoming = Seq((1L, "A"), (2L, "B2"), (4L, "D")).toDF("k", "seg")
    val out = Scd2.merge(current, incoming, "k", Seq("seg"), eff)
      .select($"k", $"seg", $"valid_from".cast("string"),
        $"valid_to".cast("string"))
      .as[(Long, String, String, Option[String])].collect().toSet
    assert(out === Set(
      (1L, "A", "2024-01-01", None),
      (2L, "B", "2024-01-01", Some("2024-02-01")),
      (2L, "B2", "2024-02-01", None),
      (3L, "C", "2024-01-01", Some("2024-02-01")),
      (4L, "D", "2024-02-01", None)))
  }

  test("merging an identical snapshot is a no-op (idempotent re-run)") {
    val current = hist(Seq(
      (1L, "A", "2024-01-01", None),
      (1L, "A0", "2023-06-01", Some("2024-01-01")), // closed history
      (2L, "B", "2024-01-01", None)))
    val incoming = Seq((1L, "A"), (2L, "B")).toDF("k", "seg")
    val out = Scd2.merge(current, incoming, "k", Seq("seg"), eff)
    assert(out.exceptAll(current).isEmpty && current.exceptAll(out).isEmpty)
  }

  test("null attributes compare as values, not wildcards") {
    val current = hist(Seq((1L, null, "2024-01-01", None),
      (2L, "B", "2024-01-01", None)))
    val incoming = Seq((1L, Option.empty[String]), (2L, None))
      .toDF("k", "seg")
    val out = Scd2.merge(current, incoming, "k", Seq("seg"), eff)
    // null == null ⇒ row 1 unchanged; B vs null ⇒ row 2 versions
    assert(out.filter($"k" === 1L).count() === 1)
    val r2 = out.filter($"k" === 2L)
      .select($"seg", $"valid_to".cast("string"))
      .as[(Option[String], Option[String])].collect().toSet
    assert(r2 === Set((Some("B"), Some("2024-02-01")), (None, None)))
  }

  test("cdc compaction: last op wins, tombstone deletes, delete-then-reinsert survives") {
    // (key, op, value, us, event_id)
    val log = Seq(
      (1L, "upsert", 10.0, 100L, 1L),   // key 1: upsert, upsert, DELETE
      (1L, "upsert", 20.0, 200L, 2L),
      (1L, "del",    0.0,  300L, 3L),
      (2L, "del",    0.0,  100L, 4L),   // key 2: delete THEN re-insert
      (2L, "upsert", 42.0, 200L, 5L),
      (3L, "upsert", 7.0,  100L, 6L),   // key 3: same us, event_id breaks tie
      (3L, "upsert", 8.0,  100L, 7L)
    ).toDF("key", "op", "value", "us", "event_id")
    val got = Scd2.cdcState(log, tombstone = "del")
      .select($"key", $"last_value", $"last_us", $"n_ops")
      .as[(Long, Double, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(1L), "tombstoned key must be absent")
    assert(got(2L) === ((2L, 42.0, 200L, 2L)))
    assert(got(3L) === ((3L, 8.0, 100L, 2L)))
  }

  test("events fixture upholds cdcState's tie-break precondition: event_id unique per key") {
    // cdcState's max(struct(us, event_id, op, value)) matches the oracle's
    // ROW_NUMBER ... ORDER BY us DESC, event_id DESC only because
    // (us, event_id) identifies at most one row per key. Pin that here so
    // a fixture change that breaks it fails loudly instead of silently
    // shifting parity onto the (op, value) tail of the struct ordering.
    val events = graft.Tables.events(spark, sf001)
      .select($"user_id".as("key"), $"event_id")
    val total = events.count()
    val distinctPairs = events.distinct().count()
    assert(total > 0)
    assert(distinctPairs === total,
      s"duplicate (key, event_id) pairs: ${total - distinctPairs}")
  }

  test("cdc compaction is idempotent: re-applying the same log changes nothing") {
    val events = graft.Tables.events(spark, sf001)
      .select($"user_id".as("key"), $"event_type".as("op"),
        $"value", unix_micros($"ts").as("us"), $"event_id")
    val once = Scd2.cdcState(events, "error")
    val twice = Scd2.cdcState(events.union(events), "error")
      .withColumn("n_ops", ($"n_ops" / 2).cast("long"))  // doubled log doubles only the tally
    assert(once.count() > 0)
    assert(once.exceptAll(twice.select(once.columns.map(col): _*)).isEmpty
      && twice.select(once.columns.map(col): _*).exceptAll(once).isEmpty)
  }
}
