package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Alias-tolerant CSV ingest (reference E1,
  * scripts/pricing/01_import_pricecharting_csv.js):
  *
  *  - S1: quoted-field CSV with `""` escapes → Spark's CSV source
  *    (`quote`/`escape` options) replaces the char-by-char parser
  *    (01:36-76).
  *  - F2: header normalization — trim, lower, whitespace→`_`, drop
  *    non-`[a-z0-9_]` (01:92-98) — a SCHEMA operation, done on
  *    `df.columns` at plan time, zero row cost.
  *  - alias resolution — each logical column resolves from a list of
  *    accepted header spellings (01:136-142), e.g.
  *    `loose-price|loose_price|loose_price_cents`; unmatched physical
  *    columns are preserved into a `raw` JSON map column (01:214-217).
  *  - P8: skip rows with blank id/name (01:192,198).
  *  - last-write-wins per key: the reference upserts row-at-a-time in
  *    file order so the file's LAST occurrence of a key wins (01:171).
  *    Spark reads splits in file-offset order, so
  *    `monotonically_increasing_id` is monotone in row position within
  *    a single input file — the max-id row per key is the file-last row.
  *
  * The reference's per-row INSERT (N network round-trips, its slowest
  * pattern — SURVEY §3 E1) becomes one distributed job: parse, resolve,
  * dedupe (one shuffle on the key), write.
  */
object CsvIngest {

  def normalizeHeader(h: String): String =
    h.trim.toLowerCase.replaceAll("\\s+", "_").replaceAll("[^a-z0-9_]", "")

  /** Read CSV with normalized headers. RFC-4180 semantics: quotes
    * escape by DOUBLING (`escape = "`), and `multiLine` lets a quoted
    * field carry raw newlines — without it a record containing one is
    * split mid-field (found by the round-10 adversarial corpus).
    * multiLine parses at FILE granularity (a record boundary can't be
    * found mid-file without parsing from the start), so parallelism =
    * #files — the staging writers emit many parts, which is exactly
    * why. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)
    df.toDF(df.columns.map(normalizeHeader).toIndexedSeq: _*)
  }

  /** Resolve logical columns from alias lists; keep unmatched physical
    * columns in a `raw` JSON column. Missing logical columns come back
    * as typed nulls (schema-on-read semantics, SURVEY §1.4).
    */
  def resolveAliases(df: DataFrame, aliases: Map[String, Seq[String]]): DataFrame = {
    val present = df.columns.toSet
    val resolved: Seq[(String, Option[String])] = aliases.toSeq.map {
      case (logical, alts) => logical -> alts.find(present.contains)
    }
    val used = resolved.flatMap(_._2).toSet
    val rawCols = df.columns.filterNot(used.contains)
    val cols: Seq[Column] = resolved.map {
      case (logical, Some(phys)) => col(phys).as(logical)
      case (logical, None)       => lit(null).cast("string").as(logical)
    }
    val raw =
      if (rawCols.isEmpty) lit(null).cast("string").as("raw")
      else to_json(struct(rawCols.map(col).toIndexedSeq: _*)).as("raw")
    df.select(cols :+ raw: _*)
  }

  /** Last-occurrence-wins dedupe on a logical key (ref 01:171-186).
    *
    * Ordering contract across a DIRECTORY of inputs: files are ranked by
    * lexicographic file name (timestamped export names — the common
    * vendor convention — make that calendar order), and by row position
    * within each file; the key's winner is the last row of the
    * lexicographically-last file containing it. Row position within a
    * file is the pair (`_metadata.file_block_start`,
    * `monotonically_increasing_id`): the metadata column orders the
    * file's read SPLITS by their physical byte offset, and the id is
    * monotone within a single split by construction (partitionId in the
    * high bits, a per-partition counter below). Neither half alone is
    * file-ordered — `monotonically_increasing_id` across splits follows
    * Spark's internal largest-first split packing, so a
    * later-but-bigger file would get LOWER ids and silently lose, and a
    * multi-split file's id order depends on packing internals — but the
    * pair depends on nothing beyond "a split is read sequentially".
    * (CSV scans don't expose `_metadata.row_index`; that exact-row form
    * is Parquet-only.) Both traps are covered by CsvIngestSpec: two
    * files whose winners differ, and one large file read as multiple
    * splits.
    */
  def dedupeLastPerKey(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val withPos = df
      .withColumn("__file", col("_metadata.file_path"))
      .withColumn("__blk", col("_metadata.file_block_start"))
      .withColumn("__pos", monotonically_increasing_id())
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__file").desc, col("__blk").desc, col("__pos").desc)
    withPos.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__file", "__blk", "__pos", "__rn")
  }

  /** Full E1 pipeline: read → normalize → resolve → row guards → money
    * parse → dedupe-last-per-key. `moneyCols` are parsed to integer
    * cents (F1); `requiredCols` blank → row dropped (P8).
    */
  def ingest(
      spark: SparkSession,
      path: String,
      aliases: Map[String, Seq[String]],
      keyCols: Seq[String],
      requiredCols: Seq[String],
      moneyCols: Seq[String]): DataFrame = {
    val resolved = resolveAliases(read(spark, path), aliases)
    val guarded = requiredCols.foldLeft(resolved) { (d, c) =>
      d.filter(col(c).isNotNull && length(trim(col(c))) > 0)
    }
    val parsed = moneyCols.foldLeft(guarded) { (d, c) =>
      d.withColumn(s"${c}_cents", graft.functions.Money.parseCents(col(c)))
    }
    dedupeLastPerKey(parsed, keyCols)
  }
}
