package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ORC round trip: the read-back must reconcile with the parquet
  * source, and the scan must show the three properties that make a
  * columnar source usable at 100 TB — partition pruning, predicate
  * pushdown into the ORC reader, and column pruning.
  */
class FormatOpsSpec extends SparkSpec {

  test("round trip reconciles with the parquet source") {
    val got = FormatOps.orcRoundtrip.build(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val expect = graft.Tables.lineitem(spark, sf001)
      .filter(col("l_returnflag") === "R" && col("l_quantity") <= 25)
      .groupBy(col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("l_quantity")).cast("long")).as("q"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("c"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expect, "ORC round trip drifted from the parquet source")
    assert(got.nonEmpty, "filter must keep rows")
  }

  test("scan plan: partition pruning + ORC pushdown + pruned ReadSchema") {
    val scan = FormatOps.scanStagedOrc(spark, sf001)
      .filter(col("l_returnflag") === "R" && col("l_quantity") <= 25)
      .select(col("l_linestatus"), col("l_quantity"), col("l_extendedprice"))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("l_returnflag"),
      s"partition filter on l_returnflag missing from scan:\n$plan")
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").matches("(?s).*PushedFilters:\\[[^\\]]*l_quantity.*"),
      s"l_quantity predicate not pushed to the ORC reader:\n$plan")
    // ReadSchema carries only the three touched data columns (the
    // partition column comes from directory names, not file bytes)
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse(fail(s"no ReadSchema:\n$plan"))
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"),
      s"scan reads columns the query never touches: $readSchema")
    Seq("l_linestatus", "l_quantity", "l_extendedprice").foreach { c =>
      assert(readSchema.contains(c), s"$c missing from ReadSchema: $readSchema")
    }
    // partition pruning actually drops files: the pruned scan must list
    // strictly fewer files than the full-table scan
    val all = FormatOps.scanStagedOrc(spark, sf001)
    def files(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
    assert(files(scan) < files(all.select(col("l_linestatus"))),
      "partition filter did not reduce the file list")
  }
}
