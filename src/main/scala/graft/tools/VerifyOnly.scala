package graft.tools

/** Dev harness (not part of the engine surface): graft.Verify for a
  * subset of ops — dump named queries + their oracle SQL so
  * `tools/check.py` can diff just the ops under active development:
  * `runMain graft.tools.VerifyOnly <sfDir> <outDir> <opName> [...]`.
  * Session shape and JSON escaping are graft.Verify's own, so this
  * harness cannot drift from what the driver runs.
  */
object VerifyOnly {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names @ _*) = args
    // Same parallelism knob as Verify.main — cpu count changes plan
    // shape (AQE coalescing, partition counts), so the dev harness must
    // track the driver's session, not pin its own.
    val spark = graft.Verify.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    new java.io.File(outDir).mkdirs()
    val qs = graft.SparkEntry.queries
    names.foreach { name =>
      val fn = qs.getOrElse(name, sys.error(s"unknown op $name"))
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
    }
    graft.Verify.writeOracleJson(
      graft.Verify.resolveOracles(spark,
        graft.SparkEntry.oracleSql.view.filterKeys(names.contains).toMap,
        sfDir),
      outDir)
    spark.stop()
  }
}
