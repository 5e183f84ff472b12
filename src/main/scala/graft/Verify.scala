package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** The verify/bench session shape, shared with the dev tools so the
    * targeted harness (tools.VerifyOnly) can never drift from what the
    * driver actually runs. */
  def buildSession(cpus: String): SparkSession = {
    val spark = EngineConf.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Resolve dump-time placeholders: an oracle may read an
    * ENGINE-PERSISTED artifact (e.g. the phash store — its build step,
    * image decode, cannot replay in SQL, but its relational output can
    * be read back), and the artifact's path is keyed by the sf dir,
    * which is known only when the dump runs. The substituted SQL is
    * what lands in `oracle_sql.json`; the driver sees plain SQL. */
  def resolveOracles(spark: SparkSession,
      oracles: Map[String, String], sfDir: String): Map[String, String] = {
    import graft.operators.MultimodalOps
    oracles.view.mapValues(_.replace(
      MultimodalOps.PhashStoreToken,
      MultimodalOps.phashStorePath(spark, sfDir)))
      .toMap
  }

  /** Dump `oracles` as a JSON object file for tools/check.py. */
  def writeOracleJson(oracles: Map[String, String], outDir: String): Unit = {
    val json = oracles
      .map { case (k, v) => s"${jsonEscape(k)}: ${jsonEscape(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    writeOracleJson(resolveOracles(spark, SparkEntry.oracleSql, sfDir), outDir)
    spark.stop()
  }
}
