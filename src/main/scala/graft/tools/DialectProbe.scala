package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis._

/** Cross-engine dialect probe (dev tooling for the adversarial sweep):
  * dumps the per-document primitives the quality/drift laws are built
  * from — ascii-lowered [a-z]+ tokens with their rolling-hash
  * fingerprints, whitespace-split word counts, shingle counts, BPE-ish
  * token counts — as parquet for a DuckDB-side diff. Narrows a
  * hash-mismatched composite op to the primitive that diverges.
  *
  *   sbt -batch "runMain graft.tools.DialectProbe <sfDir> <outDir>"
  */
object DialectProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, out) = args
    val spark = graft.Verify.buildSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val docs = graft.Tables.documents(spark, dir)
    docs.select(col("doc_id"),
        explode(regexp_extract_all(asciiLower(col("text")), lit("[a-z]+"),
          lit(0))).as("tok"))
      .select(col("doc_id"), col("tok"), fingerprint(col("tok")).as("fp"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/toks")
    docs.select(col("doc_id"),
        bpeishTokenCount(col("text")).cast("long").as("n_tokens"),
        size(split(asciiLower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+"))
          .cast("long").as("n_words"),
        size(wordShingles(col("text"), 3)).cast("long").as("n_sh"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/stats")
    spark.stop()
  }
}
