package graft.sources

import graft.SparkSpec
import java.sql.DriverManager

/** Live-database (JDBC) source switch in [[graft.Tables]]: round-trip
  * against an embedded Derby database (pure-JVM, ships with Spark's
  * jars) — the same `format("jdbc")` path a production deployment points
  * at PostgreSQL, which is what the reference reads live
  * (revalueCollection.mjs:9-16).
  */
class JdbcSourceSpec extends SparkSpec {

  test("Tables resolve via JDBC when graft.jdbc.url is set") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE region (r_regionkey BIGINT, r_name VARCHAR(32))")
      st.executeUpdate("INSERT INTO region VALUES (0, 'AFRICA'), (1, 'AMERICA')")
      st.close()
      spark.conf.set("graft.jdbc.url", url)
      try {
        val got = graft.Tables.region(spark, "/nonexistent")
          .orderBy("R_REGIONKEY").collect()
        assert(got.length === 2)
        assert(got.map(_.getString(1)).toSeq === Seq("AFRICA", "AMERICA"))
      } finally spark.conf.unset("graft.jdbc.url")
      // and the parquet default still works after unsetting
      assert(graft.Tables.region(spark, sf001).count() === 5)
    } finally conn.close()
  }
}
