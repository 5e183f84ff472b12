package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LongArrayDotSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),          // 4+10+18 = 32
    (2L, Seq(-2L, 0L, 7L), Seq(3L, 9L, -1L)),        // -6+0-7 = -13
    (3L, Seq.empty[Long], Seq.empty[Long]),          // 0
    (4L, Seq(5L), Seq(2L, 100L))                     // common prefix: 10
  ).toDF("id", "a", "b")

  test("graft_dot registered via extensions, callable from SQL and API") {
    assert(spark.catalog.functionExists("graft_dot"))
    val api = df.select($"id", call_function("graft_dot", $"a", $"b").as("d"))
      .as[(Long, Long)].collect().toMap
    assert(api === Map(1L -> 32L, 2L -> -13L, 3L -> 0L, 4L -> 10L))
    df.createOrReplaceTempView("dot_fixture")
    val sql = spark.sql("SELECT id, graft_dot(a, b) AS d FROM dot_fixture")
      .as[(Long, Long)].collect().toMap
    assert(sql === api)
  }

  test("matches the interpreted higher-order-function form on real vectors") {
    val e = graft.Tables.embeddings(spark, sf001)
      .select($"vec_id", graft.operators.Similarity.quantize($"embedding").as("v"))
    val native = e.select($"vec_id", call_function("graft_dot", $"v", $"v").as("n2"))
      .as[(Long, Long)].collect().toMap
    val hof = e.select($"vec_id",
        aggregate(zip_with($"v", $"v", (x, y) => x * y), lit(0L), (acc, x) => acc + x).as("n2"))
      .as[(Long, Long)].collect().toMap
    assert(native === hof)
  }

  test("null elements contribute zero; null array yields null") {
    val rows = spark.sql(
      """SELECT graft_dot(array(1L, NULL, 3L), array(10L, 20L, 30L)) AS withNullElem,
        |       graft_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS withNullArr""".stripMargin)
      .collect().head
    assert(rows.getLong(0) === 100L)   // 10 + skipped + 90
    assert(rows.isNullAt(1))
  }
}
