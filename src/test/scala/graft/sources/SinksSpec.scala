package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** S7–S9 sink semantics: idempotent day-partition overwrite, null-safe
  * keyed upsert (SURVEY §5.3 property: running a day twice ≡ once).
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("upsertByDay: re-running a day replaces, other days survive") {
    val path = Files.createTempDirectory("upsert_day").toString
    val day1 = Seq((1L, 10L, "2026-01-01"), (2L, 20L, "2026-01-01"))
      .toDF("id", "v", "as_of_date")
    val day2 = Seq((3L, 30L, "2026-01-02")).toDF("id", "v", "as_of_date")
    Sinks.upsertByDay(day1, path, "as_of_date")
    Sinks.upsertByDay(day2, path, "as_of_date")
    // recompute day1 with different values — must replace day1 only
    val day1b = Seq((1L, 11L, "2026-01-01")).toDF("id", "v", "as_of_date")
    Sinks.upsertByDay(day1b, path, "as_of_date")
    val got = spark.read.parquet(path)
      .select("id", "v", "as_of_date").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(got === Seq((1L, 11L, "2026-01-01"), (3L, 30L, "2026-01-02")))
    // idempotency: same write again → same content
    Sinks.upsertByDay(day1b, path, "as_of_date")
    assert(spark.read.parquet(path).count() === 2)
  }

  test("upsertByKey: incoming wins, null-safe key match (S8/J5/P7)") {
    val existing = Seq(
      (1L, Option("NM"), 100L),
      (2L, None: Option[String], 200L),
      (3L, Option("LP"), 300L)
    ).toDF("item", "cond", "v")
    val incoming = Seq(
      (2L, None: Option[String], 999L), // matches the null-cond row
      (4L, Option("NM"), 400L)          // brand new
    ).toDF("item", "cond", "v")
    val got = Sinks.upsertByKey(existing, incoming, Seq("item", "cond"))
      .select("item", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 100L), (2L, 999L), (3L, 300L), (4L, 400L)))
  }

  test("writeFeed: TSV with CRLF and tab-stripped fields (S11/F13)") {
    val path = Files.createTempDirectory("feed").toString + "/out"
    val df = Seq((1L, "has\ttab", "plain")).toDF("id", "title", "desc")
    Sinks.writeFeed(df, path)
    val file = new java.io.File(path).listFiles()
      .find(_.getName.endsWith(".csv")).get
    val bytes = Files.readString(file.toPath)
    assert(bytes.contains("\r\n"))
    assert(bytes.contains("has tab"))
    assert(bytes.startsWith("id\ttitle\tdesc"))
  }
}
