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
}
