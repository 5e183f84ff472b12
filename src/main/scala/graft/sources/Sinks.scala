package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-path patterns for the reference's upsert-shaped sinks
  * (SURVEY §2.1 S7–S11, §4 "write-path design").
  *
  * Parquet has no keyed MERGE; the reference's three upsert flavors all
  * reduce to deterministic recompute + partition overwrite:
  *  - S7 `ON CONFLICT DO UPDATE` / S9 delete-then-insert-day →
  *    [[upsertByDay]]: dynamic partition overwrite on the date column —
  *    only the recomputed days are replaced, exactly the reference's
  *    DELETE WHERE as_of_date=$1 + INSERT (revalueCollection.mjs:135-165).
  *  - S8 update-then-insert without a unique index →
  *    [[upsertByKey]]: anti-join new vs existing on a null-safe key,
  *    union, rewrite (02_normalize_scryfall_prices.js:159-193).
  *  - S11 delimited feed → [[writeFeed]]: header + quoted TSV/CSV with
  *    CRLF line endings (exportGoogleMerchantFeed.mjs:316-398).
  *
  * Idempotency is the reference's core safety property (SURVEY §5):
  * re-running a day replaces that day's partition with identical
  * content. Cross-table atomicity is per-output (file-commit protocol) —
  * same gap the SURVEY documents as acceptable.
  *
  * At 100 TB: partition overwrite touches only affected `as_of_date`
  * dirs (a backfill of 3 days rewrites 3/65700 partitions); writers
  * should `repartition(dateCol)` first so each day writes from one
  * task wave without small files.
  */
object Sinks {

  /** S7/S9: recompute-and-overwrite the date partitions present in `df`. */
  def upsertByDay(df: DataFrame, path: String, dateCol: String): Unit = {
    df.sparkSession.conf
      .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.repartition(col(dateCol))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(dateCol)
      .parquet(path)
  }

  /** S8: union `existing` rows not matched by `incoming`'s null-safe key
    * with all `incoming` rows (update-then-insert ≡ incoming wins),
    * full rewrite. Caller owns re-reading before overwriting the same
    * location (read → compute → write-to-new, then swap).
    */
  def upsertByKey(
      existing: DataFrame,
      incoming: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val cond = keyCols
      .map(k => existing(k) <=> incoming(k))
      .reduce(_ && _)
    val kept = existing.join(incoming, cond, "left_anti")
    kept.unionByName(incoming.select(existing.columns.map(col).toIndexedSeq: _*))
  }

  /** S11: Google-Merchant-style delimited feed file (TSV default):
    * header row, CRLF line endings, tab-safe fields. */
  /** The TSV field-sanitize law: every record-breaking char (tab,
    * LF, CR) becomes ONE space — 1:1, not run-collapsing, so the
    * feed-file contract's "injected tab comes back as a space" check
    * stays exact. Shared with the op's expected-title derivation. */
  def feedSanitize(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    regexp_replace(c, "[\\t\\n\\r]", " ")

  def writeFeed(
      df: DataFrame,
      path: String,
      sep: String = "\t",
      crlf: Boolean = true): Unit = {
    // F13: a TSV cannot quote — tabs inside fields become spaces, and
    // so do raw newlines/CRs (a CRLF-delimited record cannot carry
    // either; the merchant-feed spec forbids them in fields — found by
    // the round-10 adversarial corpus, where an embedded newline split
    // a record mid-field on read-back)
    val safe =
      if (sep == "\t")
        df.select(df.schema.fields.map { f =>
          if (f.dataType == org.apache.spark.sql.types.StringType)
            feedSanitize(col(f.name)).as(f.name)
          else col(f.name)
        }.toIndexedSeq: _*)
      else df
    safe.write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("sep", sep)
      .option("lineSep", if (crlf) "\r\n" else "\n")
      // the CSV WRITER trims field-edge whitespace by default
      // (ignore*WhiteSpace=true on write, unlike the reader) — a feed
      // writer must not mutate fields beyond the sanitize law, and the
      // trim broke the tab→space contract on fields whose sanitized
      // space lands at an edge (empty source name → " Brand#x")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
  }
}
