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

  /** Driver-side listing signature of the files an artifact was derived
    * from — `name|length|mtime` per matched file, sorted. Cheap (no
    * content read) staleness fingerprint for amortized staging
    * artifacts: a cached fixture or bootstrap base is valid only while
    * its source files' signature is unchanged; regenerated testdata or
    * a partially cleaned cache then triggers a rebuild instead of a
    * silently-wrong reuse. */
  def sourceSignature(
      spark: SparkSession, dir: String, glob: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val filter = new org.apache.hadoop.fs.GlobFilter(glob)
    fs.listStatus(p)
      .filter(st => filter.accept(st.getPath))
      .flatMap { st =>
        if (st.isFile)
          Array(st.getPath.getName -> st)
        else {
          // a table stored as a DIRECTORY of part files (any
          // Spark-written corpus) signs its data files; an isFile-only
          // listing signed "" and a stale store could never be detected
          // (r13 soak catch). The descent is RECURSIVE (ADVICE r14): a
          // partitioned table (key=value subdirectories) has only
          // directory children at depth 1 and would otherwise still
          // sign empty. Entries carry the path relative to the matched
          // root so identically-named part files in different
          // partitions cannot collapse into one signature entry.
          // Hidden/_-prefixed SEGMENTS (_SUCCESS, .crc, _temporary/*,
          // .staging/*) stay out so a re-run that only touches markers
          // doesn't churn the signature.
          val rootUri = st.getPath.toUri
          val it = fs.listFiles(st.getPath, true)
          val buf = scala.collection.mutable.ArrayBuffer
            .empty[(String, org.apache.hadoop.fs.FileStatus)]
          while (it.hasNext) {
            val c = it.next()
            val rel = rootUri.relativize(c.getPath.toUri).getPath
            val segments = rel.split("/")
            if (!segments.exists(s =>
                s.startsWith("_") || s.startsWith(".")))
              buf += s"${st.getPath.getName}/$rel" -> c
          }
          buf.toArray
        }
      }
      .map { case (rel, st) =>
        s"$rel|${st.getLen}|${st.getModificationTime}"
      }
      .sorted.mkString(",")
  }

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
