package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** fx_pricecharting_csv (FIXTURES.md §B): alias-tolerant headers, quoted
  * commas + "" escapes, money strings, row guards, last-write-wins keys.
  */
class CsvIngestSpec extends SparkSpec {

  private val aliases = Map(
    "id" -> Seq("id", "pricecharting_id"),
    "product_name" -> Seq("product-name", "product_name", "name"),
    "loose_price" -> Seq("loose-price", "loose_price", "loose_price_cents"),
    "console_name" -> Seq("console-name", "console_name"))

  private def writeCsv(content: String): String = {
    val f = Files.createTempFile("fx_pricecharting", ".csv")
    Files.writeString(f, content)
    f.toString
  }

  test("header normalization handles the reference's variants (F2)") {
    assert(CsvIngest.normalizeHeader(" Loose-Price ") === "looseprice")
    assert(CsvIngest.normalizeHeader("loose price") === "loose_price")
    assert(CsvIngest.normalizeHeader("Product Name!") === "product_name")
  }

  test("ingest: aliases, quotes, money, guards, last-write-wins") {
    val csv = writeCsv(Seq(
      "id,Product Name,loose price,console-name,bonus",
      "1,\"Charizard, 1st ed\",\"$1,234.56\",NES,x",
      "2,\"He said \"\"hi\"\"\",junk,SNES,y",
      ",missing id,$5,N64,z",
      "3,   ,$6,N64,w",
      "1,Charizard LAST,$99,NES,v",
      "").mkString("\n"))
    val got = CsvIngest.ingest(spark, csv, aliases,
      keyCols = Seq("id"),
      requiredCols = Seq("id", "product_name"),
      moneyCols = Seq("loose_price"))
    val rows = got.orderBy("id").collect()
    assert(rows.length === 2) // blank-id and blank-name rows dropped
    val r1 = rows(0)
    // last occurrence of id=1 wins (ref 01:171 upsert order)
    assert(r1.getAs[String]("product_name") === "Charizard LAST")
    assert(r1.getAs[Long]("loose_price_cents") === 9900L)
    val r2 = rows(1)
    assert(r2.getAs[String]("product_name") === "He said \"hi\"")
    assert(r2.isNullAt(r2.fieldIndex("loose_price_cents"))) // junk → null
    // unmatched physical column preserved in raw JSON
    assert(r1.getAs[String]("raw").contains("\"bonus\""))
  }

  test("multi-file last-write-wins follows file-name order, not split order") {
    // two files in one directory, same key in both. The later-named file
    // (b_*.csv) is made much LARGER: Spark packs read splits
    // largest-first, so monotonically_increasing_id alone would give the
    // big file LOWER ids and the a-file's row would wrongly win; the
    // file-name ordering must pick b's value regardless.
    val dir = Files.createTempDirectory("fx_multifile")
    val filler = (100 to 400).map(i => s"$i,Filler $i,$$1.00,NES,x")
    Files.writeString(dir.resolve("a_2026-01-01.csv"), Seq(
      "id,Product Name,loose price,console-name,bonus",
      "1,From Day One,$10,NES,x",
      "").mkString("\n"))
    Files.writeString(dir.resolve("b_2026-01-02.csv"), (Seq(
      "id,Product Name,loose price,console-name,bonus",
      "1,From Day Two,$20,NES,x") ++ filler :+ "").mkString("\n"))
    val got = CsvIngest.ingest(spark, dir.toString, aliases,
      keyCols = Seq("id"),
      requiredCols = Seq("id", "product_name"),
      moneyCols = Seq("loose_price"))
    val r = got.filter(org.apache.spark.sql.functions.col("id") === "1")
      .collect().head
    assert(r.getAs[String]("product_name") === "From Day Two")
    assert(r.getAs[Long]("loose_price_cents") === 2000L)
    assert(got.count() === 302) // key 1 (merged) + 301 filler keys
  }

  test("within-one-large-file last-write-wins: multiLine reads are " +
    "file-granular (no mid-record splits BY CONSTRUCTION) and the " +
    "tail row still wins") {
    // Pre-round-10 this test forced the file into several SPLITS and
    // proved the (file_block_start, monotonically_increasing_id) order
    // key reassembled them. The reader is now `multiLine` (a quoted
    // field may carry raw newlines — adversarial-parity fix), and a
    // multiLine CSV cannot be split mid-file by ANY engine: record
    // boundaries aren't findable without parsing from the start. So
    // the invariant worth pinning flipped — even under a tiny
    // maxPartitionBytes the file must stay ONE partition (if this ever
    // starts splitting, quoted-newline records silently corrupt), and
    // within it row order is read order, so the tail duplicate wins.
    val dir = Files.createTempDirectory("fx_bigfile")
    val filler = (100 to 3000).map(i => s"$i,Filler item number $i,$$1.00,NES,padpadpad")
    Files.writeString(dir.resolve("big.csv"), (Seq(
      "id,Product Name,loose price,console-name,bonus",
      "1,From The Head,$10,NES,x") ++ filler :+
      "1,From The Tail,$20,NES,x" :+ "").mkString("\n"))
    val conf = spark.conf
    val saved = conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", "16384")
      assert(CsvIngest.read(spark, dir.toString).rdd.getNumPartitions === 1,
        "a multiLine CSV file must never be split mid-file")
      val got = CsvIngest.ingest(spark, dir.toString, aliases,
        keyCols = Seq("id"),
        requiredCols = Seq("id", "product_name"),
        moneyCols = Seq("loose_price"))
      val r = got.filter(org.apache.spark.sql.functions.col("id") === "1")
        .collect().head
      assert(r.getAs[String]("product_name") === "From The Tail")
      assert(r.getAs[Long]("loose_price_cents") === 2000L)
    } finally conf.set("spark.sql.files.maxPartitionBytes", saved)
  }

  test("quoted fields round-trip raw newlines and doubled quotes " +
    "(RFC-4180, multiLine)") {
    val dir = Files.createTempDirectory("fx_rfc4180")
    Files.writeString(dir.resolve("q.csv"),
      "id,Product Name,loose price,console-name\n" +
        "1,\"line one\nline two\",$10,NES\n" +
        "2,\"he said \"\"hi\"\", twice\",$20,SNES\n")
    val got = CsvIngest.ingest(spark, dir.toString, aliases,
      keyCols = Seq("id"),
      requiredCols = Seq("id", "product_name"),
      moneyCols = Seq("loose_price"))
      .orderBy(org.apache.spark.sql.functions.col("id"))
      .collect()
    assert(got.length === 2)
    assert(got(0).getAs[String]("product_name") === "line one\nline two")
    assert(got(1).getAs[String]("product_name") === "he said \"hi\", twice")
  }

  test("missing logical column resolves to typed null") {
    val csv = writeCsv("id,name\n7,thing\n")
    val got = CsvIngest.resolveAliases(CsvIngest.read(spark, csv), aliases)
    val r = got.collect().head
    assert(r.getAs[String]("id") === "7")
    assert(r.isNullAt(r.fieldIndex("loose_price")))
  }
}
