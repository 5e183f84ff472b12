package graft.sources

import graft.SparkSpec
import java.sql.DriverManager
import org.apache.spark.sql.functions._

/** Write-back path: [[JdbcSink.upsertByKeyJdbc]] against embedded Derby
  * (same harness as JdbcSourceSpec) — semantics must equal
  * [[Sinks.upsertByKey]] computed in Spark over the same frames. */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftsink;create=true"

  private def withTable[T](ddl: String, table: String)(body: => T): T = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(s"DROP TABLE $table") catch { case _: Exception => () }
      st.executeUpdate(ddl)
      st.close()
    } finally conn.close()
    body
  }

  private def readBack(table: String) =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()

  test("round trip equals Sinks.upsertByKey: update, insert, untouched rows, null keys") {
    withTable(
      "CREATE TABLE prices (item_key VARCHAR(20), source VARCHAR(10), cents BIGINT)",
      "prices") {
      val existing = Seq(
        (Some("a"), "v1", 100L),   // will be updated
        (Some("b"), "v1", 200L),   // untouched
        (None, "v1", 300L),        // null key — updated null-safely
        (Some("d"), "v1", 400L))   // untouched
        .toDF("item_key", "source", "cents")
      // seed the table through the sink itself (empty table ⇒ all insert)
      JdbcSink.upsertByKeyJdbc(existing, url, "prices", Seq("item_key"))
      val incoming = Seq(
        (Some("a"), "v2", 150L),   // update
        (None, "v2", 350L),        // null-key update
        (Some("z"), "v2", 999L))   // brand-new key ⇒ insert
        .toDF("item_key", "source", "cents")
      // 3 partitions + batchSize 2: exercises per-partition connections
      // and mid-partition batch flushes
      JdbcSink.upsertByKeyJdbc(
        incoming.repartition(3), url, "prices", Seq("item_key"), batchSize = 2)
      val expected = Sinks.upsertByKey(existing, incoming, Seq("item_key"))
        .as[(Option[String], String, Long)].collect().toSet
      val got = readBack("prices")
        .as[(Option[String], String, Long)].collect().toSet
      assert(got === expected)
      assert(got === Set(
        (Some("a"), "v2", 150L), (Some("b"), "v1", 200L),
        (None, "v2", 350L), (Some("d"), "v1", 400L),
        (Some("z"), "v2", 999L)))
    }
  }

  test("idempotent: re-delivering the same batch changes nothing") {
    withTable(
      "CREATE TABLE idem (k BIGINT, v VARCHAR(10))", "idem") {
      val batch = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
      JdbcSink.upsertByKeyJdbc(batch, url, "idem", Seq("k"))
      JdbcSink.upsertByKeyJdbc(batch, url, "idem", Seq("k"))
      val got = readBack("idem").as[(Long, String)].collect().toSet
      assert(got === Set((1L, "x"), (2L, "y")))
    }
  }

  test("same key twice in one batch: last occurrence wins, no duplicate row") {
    withTable(
      "CREATE TABLE dupkey (k BIGINT, v VARCHAR(10))", "dupkey") {
      // single partition, batchSize large enough that all three rows
      // share ONE batch: without the per-batch key dedup both k=1 rows
      // would UPDATE (matching nothing), then both INSERT — two rows
      val batch = Seq((1L, "first"), (2L, "other"), (1L, "last"))
        .toDF("k", "v").coalesce(1)
      JdbcSink.upsertByKeyJdbc(batch, url, "dupkey", Seq("k"), batchSize = 500)
      val got = readBack("dupkey").as[(Long, String)].collect().toSet
      assert(got === Set((1L, "last"), (2L, "other")))
      // and a null key pair dedups the same way (null-safe key equality)
      val nulls = Seq((Option.empty[Long], "n1"), (Option.empty[Long], "n2"))
        .toDF("k", "v").coalesce(1)
      JdbcSink.upsertByKeyJdbc(nulls, url, "dupkey", Seq("k"), batchSize = 500)
      val got2 = readBack("dupkey").as[(Option[Long], String)].collect().toSet
      assert(got2 === Set((Some(1L), "last"), (Some(2L), "other"),
        (None, "n2")))
    }
  }

  test("composite keys and typed columns survive the round trip") {
    withTable(
      """CREATE TABLE typed (k1 BIGINT, k2 VARCHAR(10), d DOUBLE,
        |  flag BOOLEAN, day DATE)""".stripMargin.replace("\n", " "),
      "typed") {
      val day = java.sql.Date.valueOf("2024-03-01")
      val day2 = java.sql.Date.valueOf("2024-03-02")
      val existing = Seq((1L, "a", 1.5, true, day), (1L, "b", 2.5, false, day))
        .toDF("k1", "k2", "d", "flag", "day")
      JdbcSink.upsertByKeyJdbc(existing, url, "typed", Seq("k1", "k2"))
      // same k1, different k2 ⇒ only ("a") row updates
      val incoming = Seq((1L, "a", 9.9, false, day2))
        .toDF("k1", "k2", "d", "flag", "day")
      JdbcSink.upsertByKeyJdbc(incoming, url, "typed", Seq("k1", "k2"))
      val got = readBack("typed")
        .as[(Long, String, Double, Boolean, java.sql.Date)].collect().toSet
      assert(got === Set(
        (1L, "a", 9.9, false, day2), (1L, "b", 2.5, false, day)))
    }
  }

  test("big enough to need many batches: 1000 keys, half updates half inserts") {
    // indexed like a production target — the sink's sargable mask-0
    // UPDATE (`k = ?`) must seek it, not scan (the three small tests
    // above run index-FREE on purpose: correctness can't depend on one)
    withTable("CREATE TABLE bulk (k BIGINT, v BIGINT)", "bulk") {
      val conn2 = DriverManager.getConnection(url)
      try {
        val st = conn2.createStatement()
        st.executeUpdate("CREATE INDEX bulk_k ON bulk (k)")
        st.close()
      } finally conn2.close()
      val first = spark.range(500).select($"id".as("k"), lit(0L).as("v"))
      JdbcSink.upsertByKeyJdbc(first, url, "bulk", Seq("k"), batchSize = 64)
      val second = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("v"))
      JdbcSink.upsertByKeyJdbc(
        second.repartition(4), url, "bulk", Seq("k"), batchSize = 64)
      val got = readBack("bulk")
      assert(got.count() === 1000)
      assert(got.filter($"v" =!= $"k" * 2).count() === 0)
    }
  }
}
