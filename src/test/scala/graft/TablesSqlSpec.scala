package graft

import org.apache.spark.sql.functions._

/** The SQL front door: catalog views + Spark SQL must agree with the
  * DataFrame API on the same computation, serve the engine's extension
  * functions, and re-register idempotently. */
class TablesSqlSpec extends SparkSpec {

  test("Tables.sql equals the DataFrame twin on a join-aggregate") {
    val viaSql = Tables.sql(spark, sf001,
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin)
    val viaApi = Tables.lineitem(spark, sf001)
      .join(Tables.orders(spark, sf001),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("extension functions are callable through the SQL door") {
    val d = Tables.sql(spark, sf001,
      "SELECT graft_dot(array(1L,2L,3L), array(4L,5L,6L)) AS d")
      .collect().head.getLong(0)
    assert(d === 32L)
  }

  test("view registration is idempotent and serves the derived events ts") {
    Tables.sql(spark, sf001, "SELECT 1").collect()
    val n = Tables.sql(spark, sf001,
      "SELECT COUNT(*) AS n FROM events WHERE ts IS NOT NULL")
      .collect().head.getLong(0)
    assert(n === 1000L) // every sf0.001 event has a derived µs timestamp
  }
}
