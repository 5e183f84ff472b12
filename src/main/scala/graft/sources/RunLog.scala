package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Import-run provenance (reference S2/S3/A5,
  * scripts/pricing/01_import_pricecharting_csv.js:119-121,148-154,244-249):
  * each ingest run logs the source file's SHA-256, metadata, and the
  * final row count to an append-only run-log table.
  */
object RunLog {

  /** File digests via the binaryFile source — distributed, no driver
    * read (S2: `sha2(content, 256)`). Takes the directory plus a name
    * glob (`pathGlobFilter`) rather than a glob path: the directory's
    * existence is what the caller can guarantee (it just committed a
    * write there), so listing never fails on glob resolution. */
  def fileDigests(
      spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select(col("path").as("file_name"),
        sha2(col("content"), 256).as("file_sha256"),
        col("length").as("file_bytes"))

  /** Append one run row (S3 + A5 row-count update folded into a single
    * append — the rebuild computes the count before logging). */
  def logRun(
      spark: SparkSession,
      logPath: String,
      game: String,
      digests: DataFrame,
      rowCount: Long): Unit = {
    digests
      .withColumn("game", lit(game))
      .withColumn("row_count", lit(rowCount))
      .withColumn("logged_at", current_timestamp())
      .write.mode(SaveMode.Append).parquet(logPath)
  }
}
