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

  test("partitionColumn conf yields a range-split multi-partition scan") {
    val url = "jdbc:derby:memory:graftdb2;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE orders (o_orderkey BIGINT, o_totalprice DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO orders VALUES (?, ?)")
      (1 to 100).foreach { i =>
        ins.setLong(1, i.toLong); ins.setDouble(2, i * 1.5)
        ins.addBatch()
      }
      ins.executeBatch(); ins.close(); st.close()
      spark.conf.set("graft.jdbc.url", url)
      spark.conf.set("graft.jdbc.partitionColumn.orders", "o_orderkey")
      spark.conf.set("graft.jdbc.numPartitions", "4")
      try {
        // bounds NOT configured → probed via the MIN/MAX subquery
        val df = graft.Tables.orders(spark, "/nonexistent")
        assert(df.rdd.getNumPartitions === 4)
        assert(df.count() === 100)
        // range split loses no rows and overlaps none
        assert(df.agg(org.apache.spark.sql.functions
          .countDistinct(df("O_ORDERKEY"))).head.getLong(0) === 100)
        // explicit bounds pass through too
        spark.conf.set("graft.jdbc.lowerBound.orders", "1")
        spark.conf.set("graft.jdbc.upperBound.orders", "100")
        assert(graft.Tables.orders(spark, "/nonexistent")
          .rdd.getNumPartitions === 4)
      } finally {
        spark.conf.unset("graft.jdbc.url")
        spark.conf.unset("graft.jdbc.partitionColumn.orders")
        spark.conf.unset("graft.jdbc.numPartitions")
        spark.conf.unset("graft.jdbc.lowerBound.orders")
        spark.conf.unset("graft.jdbc.upperBound.orders")
      }
    } finally conn.close()
  }
}
