package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Change-feed (CDC read) semantics: the diff kernel classifies every
  * transition correctly and omits unchanged rows; the registered op's
  * feed reconciles exactly with the crafted v1→v2 transition.
  */
class ChangeFeedSpec extends SparkSpec {

  test("kernel: insert/delete/update classified, unchanged omitted") {
    import spark.implicits._
    val oldS = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val newS = Seq((1L, 10L), (2L, 25L), (4L, 40L)).toDF("k", "v")
    val got = SinkOps.changesBetween(oldS, newS).collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(got === Map(
      2L -> (("update", Some(20L), Some(25L))),
      3L -> (("delete", Some(30L), None)),
      4L -> (("insert", None, Some(40L)))),
      "unchanged key 1 must be absent; transitions must classify exactly")
  }

  test("registered feed reconciles with the crafted transition") {
    val out = SinkOps.changeFeed.build(spark, sf001).cache()
    val part = graft.Tables.part(spark, sf001)
    val nUpdates = part.filter(col("p_partkey") % 3 === 0).count()
    val nDeletes = part.filter(
      col("p_partkey") % 3 =!= 0 && col("p_partkey") % 11 === 0).count()
    val byType = out.groupBy(col("change_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType === Map(
      "insert" -> 3L, "delete" -> nDeletes, "update" -> nUpdates))
    // updates carry exactly the +5¢ reprice
    assert(out.filter(col("change_type") === "update" &&
      col("v_new") - col("v_old") =!= 5).count() === 0)
    // inserts have no old value, deletes no new value
    assert(out.filter(col("change_type") === "insert" &&
      col("v_old").isNotNull).count() === 0)
    assert(out.filter(col("change_type") === "delete" &&
      col("v_new").isNotNull).count() === 0)
    out.unpersist()
  }
}
