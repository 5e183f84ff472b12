package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class EventStreamSpec extends SparkSpec {

  test("windowedAgg over a parquet-backed stream matches batch groupBy") {
    val t = EventStream.runWindowedToMemory(spark, sf001, "ev_agg")
    val streamed = spark.table(t)
      .agg(sum("n")).collect().head.getLong(0)
    assert(streamed === 1000L) // every sf0.001 event lands in a window
  }

  test("stream → day-partition sink equals the batch table, re-run idempotent") {
    val out = "/tmp/graft_stream_days"
    EventStream.streamToDayPartitions(spark, sf001, out)
    val streamed = spark.read.parquet(out)
    val batch = graft.Tables.events(spark, sf001)
    assert(streamed.count() === batch.count())
    // day partitioning materialized on disk
    assert(new java.io.File(out).listFiles()
      .exists(_.getName.startsWith("as_of_date=")))
    // replay is idempotent (fresh checkpoint → same content)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$out.checkpoint"))
    EventStream.streamToDayPartitions(spark, sf001, out)
    assert(spark.read.parquet(out).count() === batch.count())
  }

  /** Write `df` as ONE plain parquet file named `name` directly under
    * `src` (the stream source does not recurse into nested output
    * dirs). */
  private def writeSnapFile(
      df: org.apache.spark.sql.DataFrame, src: String, name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("bod_half").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(src, name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  test("incremental best-of-day over TWO overlapping micro-batches equals batch") {
    // split lineitem into two files whose day ranges OVERLAP, so the
    // second micro-batch must MERGE with already-written day partitions
    // (a per-batch best-of-day without the merge would drop batch 1's
    // winners on the shared days); maxFilesPerTrigger=1 makes each file
    // its own micro-batch. Both files exist at bootstrap, so the base
    // covers both up to the split day and the stream owns the tail.
    val src = "/tmp/graft_bod_src"
    val base = "/tmp/graft_bod_base"
    val hot = "/tmp/graft_bod_hot"
    for (p <- Seq(src, base, s"$base.meta", hot, s"$hot.checkpoint"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
    val li = spark.read.parquet(s"$sf001/lineitem.parquet").cache()
    // odd/even orderkey halves: both halves span the whole date range →
    // every tail day with rows from both halves exercises the merge
    writeSnapFile(li.filter(col("l_orderkey") % 2 === 0), src, "half_a.parquet")
    writeSnapFile(li.filter(col("l_orderkey") % 2 === 1), src, "half_b.parquet")
    EventStream.runBestOfDayIncremental(spark, src, "half_*.parquet", base, hot)
    // the stream actually exercised the hot path (the 30-day tail)
    assert(spark.read.parquet(hot).count() > 0)
    val got = EventStream.readBestOfDayStore(spark, base, hot)
      .select(col("market_item_id"), col("as_of_date").cast("date"),
        col("source"), col("price_type"), col("value_cents"))
    val want = graft.operators.Pricing.bestOfDay.build(spark, sf001)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    li.unpersist()
  }

  test("late snapshot file overrides base days at read; compaction folds it in") {
    // bootstrap sees only half_a; half_b then arrives LATE, reaching 60
    // days back — well behind the 30-day split, so ~half its days are
    // owned by the base. Those days must come back overridden (hot
    // wins) WITHOUT the base being rewritten on the hot path.
    val src = "/tmp/graft_bod_late_src"
    val base = "/tmp/graft_bod_late_base"
    val hot = "/tmp/graft_bod_late_hot"
    for (p <- Seq(src, base, s"$base.meta", hot, s"$hot.checkpoint"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
    val li = spark.read.parquet(s"$sf001/lineitem.parquet").cache()
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val maxDay = graft.operators.Pricing.snapsOf(li)
      .agg(max(col("as_of_date"))).head().getDate(0)
    val lateFrom = java.sql.Date.valueOf(maxDay.toLocalDate.minusDays(60))
    val b = li.filter(col("l_orderkey") % 2 === 1 &&
      to_date(col("l_shipdate")) >= lit(lateFrom))
    writeSnapFile(a, src, "snap_a.parquet")
    EventStream.runBestOfDayIncremental(spark, src, "snap_*.parquet", base, hot)
    val baseFilesBefore = new java.io.File(base).listFiles().map(_.getName).toSet
    // the late drop: a NEW file, not in the bootstrap meta → every row
    // is fresh, including days the base owns
    writeSnapFile(b, src, "snap_b.parquet")
    EventStream.runBestOfDayIncremental(spark, src, "snap_*.parquet", base, hot)
    val want = graft.operators.Pricing.bestReduce(
      graft.operators.Pricing.snapsOf(a.unionByName(b)))
      .select(col("market_item_id"), col("as_of_date").cast("date"),
        col("source"), col("price_type"), col("value_cents"))
    def store() = EventStream.readBestOfDayStore(spark, base, hot)
      .select(col("market_item_id"), col("as_of_date").cast("date"),
        col("source"), col("price_type"), col("value_cents"))
    val got = store()
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // hot path never rewrites the base
    assert(new java.io.File(base).listFiles().map(_.getName).toSet
      === baseFilesBefore)
    // compaction folds hot into base and clears it; the answer is stable
    EventStream.compactBestOfDay(spark, base, hot)
    assert(!new java.io.File(hot).exists())
    val after = store()
    assert(after.exceptAll(want).isEmpty && want.exceptAll(after).isEmpty)
    li.unpersist()
  }

  test("bootstrap base invalidates when a consumed source file changes") {
    // regenerated testdata at the same path must re-bootstrap, not
    // silently merge against the stale base
    val src = "/tmp/graft_bod_stale_src"
    val base = "/tmp/graft_bod_stale_base"
    val hot = "/tmp/graft_bod_stale_hot"
    for (p <- Seq(src, base, s"$base.meta", hot, s"$hot.checkpoint"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val v1 = li.filter(col("l_orderkey") % 2 === 0)
    val v2 = li.filter(col("l_orderkey") % 3 === 0) // different content
    def result() = EventStream.readBestOfDayStore(spark, base, hot)
      .select(col("market_item_id"), col("as_of_date").cast("date"),
        col("source"), col("price_type"), col("value_cents"))
    def want(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Pricing.bestReduce(graft.operators.Pricing.snapsOf(df))
        .select(col("market_item_id"), col("as_of_date").cast("date"),
          col("source"), col("price_type"), col("value_cents"))
    writeSnapFile(v1, src, "snap.parquet")
    EventStream.runBestOfDayIncremental(spark, src, "snap*.parquet", base, hot)
    // overwrite the SAME file with different content (the regeneration)
    writeSnapFile(v2, src, "snap.parquet")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$hot.checkpoint"))
    EventStream.runBestOfDayIncremental(spark, src, "snap*.parquet", base, hot)
    val got = result()
    val w = want(v2)
    assert(got.exceptAll(w).isEmpty && w.exceptAll(got).isEmpty)
  }

  test("streaming incremental dedup equals the batch delta-vs-corpus twin") {
    import spark.implicits._
    val batch = graft.operators.Dedup.dedupIncremental.build(spark, sf001)
      .select($"doc_id", $"dup_of", $"n_matches", $"best_j")
      .as[(Long, Long, Long, Double)].collect().toSet
    val got = graft.operators.StreamingOps.streamIncrDedup.build(spark, sf001)
      .select($"doc_id", $"dup_of", $"n_matches", $"best_j")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty, "expected cross-split near-dups in testdata")
    assert(got === batch)
  }

  test("incremental dedup match log is batching-invariant across micro-batches") {
    // the scaladoc claim "correct for ANY batching" — drive the exact
    // stream transform through a MemoryStream split into 3 micro-batches
    // and pin the union of emitted logs equal to the one-shot batch run.
    import spark.implicits._
    val mod = graft.operators.Dedup.IncrementalDeltaMod
    val deltaDocs = graft.Tables.documents(spark, sf001)
      .filter($"doc_id" % mod === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(deltaDocs.length >= 3)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val q = EventStream.incrDedupMatchLog(spark, sf001,
        src.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("incr_dedup_split_test")
      .option("checkpointLocation",
        s"/tmp/graft-split-ckpt-${java.util.UUID.randomUUID()}")
      .start()
    try {
      deltaDocs.grouped((deltaDocs.length + 2) / 3).foreach { g =>
        src.addData(g.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val split = spark.table("incr_dedup_split_test")
        .select($"doc_id", $"corpus_id", $"jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val oneShot = EventStream.incrDedupMatchLog(spark, sf001,
          graft.Tables.documents(spark, sf001).filter($"doc_id" % mod === 0))
        .select($"doc_id", $"corpus_id", $"jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(oneShot.nonEmpty)
      assert(split === oneShot)
    } finally q.stop()
  }

  test("streaming incremental dedup plan is stateless (no state store ops)") {
    // the whole point: per-row signatures + stream-static broadcast
    // joins — no streaming aggregation, no dropDuplicates state, no
    // stream-stream join buffers. A stateful operator sneaking in would
    // turn the unbounded delta stream into unbounded state at 100 TB.
    graft.operators.StreamingOps.streamIncrDedup.build(spark, sf001).count()
    val active = spark.streams.active.find(
      q => q.name != null && q.name.startsWith("q_stream_incr_dedup_mem"))
    assert(active.nonEmpty, "live incremental-dedup query not found")
    val progress = active.get.lastProgress
    assert(progress != null)
    assert(progress.stateOperators.isEmpty,
      s"expected zero stateful operators, got: ${progress.json}")
  }

  test("streaming chunk dedup equals the incremental batch twin") {
    import spark.implicits._
    val batch = graft.operators.TextOps.chunkDedupIncr.build(spark, sf001)
      .select($"doc_id", $"n_chunks", $"n_kept", $"kept_fp")
      .as[(Long, Long, Long, Long)].collect().toSet
    val got = graft.operators.StreamingOps.streamChunkDedup
      .build(spark, sf001)
      .select($"doc_id", $"n_chunks", $"n_kept", $"kept_fp")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "expected delta docs in testdata")
    assert(got === batch)
  }

  test("chunk probe log is batching-invariant across micro-batches") {
    import spark.implicits._
    val mod = graft.operators.Dedup.IncrementalDeltaMod
    val deltaDocs = graft.Tables.documents(spark, sf001)
      .filter($"doc_id" % mod === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(deltaDocs.length >= 3)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val q = EventStream.chunkProbeLog(spark, sf001,
        src.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("chunk_probe_split_test")
      .option("checkpointLocation",
        s"/tmp/graft-split-ckpt-${java.util.UUID.randomUUID()}")
      .start()
    try {
      deltaDocs.grouped((deltaDocs.length + 2) / 3).foreach { g =>
        src.addData(g.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val split = spark.table("chunk_probe_split_test")
        .select($"doc_id", $"chunk_idx", $"chunk_fp", $"standing_first")
        .collect().map(_.toString).sorted.toSeq
      val oneShot = EventStream.chunkProbeLog(spark, sf001,
          graft.Tables.documents(spark, sf001).filter($"doc_id" % mod === 0))
        .select($"doc_id", $"chunk_idx", $"chunk_fp", $"standing_first")
        .collect().map(_.toString).sorted.toSeq
      assert(oneShot.nonEmpty)
      assert(split === oneShot)
    } finally q.stop()
  }

  test("streaming chunk dedup plan is stateless (no state store ops)") {
    graft.operators.StreamingOps.streamChunkDedup.build(spark, sf001).count()
    val active = spark.streams.active.find(
      q => q.name != null && q.name.startsWith("q_stream_chunk_dedup_mem"))
    assert(active.nonEmpty, "live chunk-dedup query not found")
    val progress = active.get.lastProgress
    assert(progress != null)
    assert(progress.stateOperators.isEmpty,
      s"expected zero stateful operators, got: ${progress.json}")
  }

  test("streaming decontamination equals the batch gate, stateless") {
    import spark.implicits._
    val batch = graft.operators.Curation.decontaminate.build(spark, sf001)
      .select($"doc_id", $"n_shared_ngrams", $"n_bench_docs")
      .as[(Long, Long, Long)].collect().toSet
    val got = graft.operators.StreamingOps.streamDecontaminate
      .build(spark, sf001)
      .select($"doc_id", $"n_shared_ngrams", $"n_bench_docs")
      .as[(Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "expected contaminated train docs in testdata")
    assert(got === batch)
    val active = spark.streams.active.find(
      q => q.name != null && q.name.startsWith("q_stream_decontaminate_mem"))
    assert(active.nonEmpty)
    assert(active.get.lastProgress.stateOperators.isEmpty,
      s"expected zero stateful operators: ${active.get.lastProgress.json}")
  }

  test("continuous clustering stream equals the full batch recompute") {
    import spark.implicits._
    val batch = graft.operators.GraphOps.dupClusters.build(spark, sf001)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    val got = graft.operators.StreamingOps.streamIncrCc.build(spark, sf001)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(batch.nonEmpty)
    assert(got === batch)
  }

  test("continuous clustering fold is batching-invariant and finds " +
    "CROSS-batch pairs through the growing index") {
    import spark.implicits._
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    // empty standing corpus: clustering is driven purely by arrivals
    val none = docs().withColumn("sh",
      graft.functions.TextAnalysis.wordShingles($"text", 3))
    val empty = EventStream.IncrCcState(
      EventStream.bandProbes(docs())
        .select($"doc_id", $"band", $"bucket").localCheckpoint(),
      none.select($"doc_id", $"sh").localCheckpoint(),
      docs().select($"doc_id".as("node"), $"doc_id".as("lbl"))
        .localCheckpoint())
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    val t2 = "completely different words about other things entirely here"
    val b1 = docs((10L, t1), (30L, t2))
    val b2 = docs((20L, t1)) // 20 matches 10 — which arrived EARLIER
    val folded = EventStream.incrCcFold(EventStream.incrCcFold(empty, b1), b2)
    val oneShot = EventStream.incrCcFold(empty,
      docs((10L, t1), (30L, t2), (20L, t1)))
    val fLbl = folded.labels.as[(Long, Long)].collect().toSet
    val oLbl = oneShot.labels.as[(Long, Long)].collect().toSet
    assert(fLbl === Set((10L, 10L), (20L, 10L)),
      s"cross-batch pair not merged: $fLbl")
    assert(fLbl === oLbl, "fold result depends on the batch split")
  }

  test("fold chain never releases the shared standing-labels frame") {
    import spark.implicits._
    // the fold releases superseded label checkpoints it OWNS; the
    // initial labels are the session-cached standingLabels frame other
    // consumers hold — two folds in, that frame must still be readable
    // (a wrongly-released localCheckpoint throws on access)
    val st0 = EventStream.incrCcInit(spark, sf001)
    val b1 = Seq((10000L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val b2 = Seq((20000L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val st2 = EventStream.incrCcFold(EventStream.incrCcFold(st0, b1), b2)
    assert(st2.labels.count() >= 0)
    val standing = graft.operators.GraphOps.standingLabels(spark, sf001)
    assert(standing.count() >= 0,
      "standing labels frame was released by the fold chain")
  }

  test("standing drift model: cached equals fresh aggregation") {
    import org.apache.spark.sql.functions.{col, concat_ws, count, explode, lit}
    import graft.operators.{Retrieval, StreamingOps, TextOps}
    import graft.functions.TextAnalysis.fingerprint
    val mod = graft.operators.Dedup.IncrementalDeltaMod
    val cached = StreamingOps.standingDriftModel(spark, sf001)
    val fresh = graft.Tables.documents(spark, sf001)
      .filter(col("doc_id") % mod =!= 0)
      .select(explode(TextOps.bigramArray).as("bg"))
      .select((fingerprint(concat_ws(" ", col("bg.w1"), col("bg.w2")))
        % Retrieval.DsirDim).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    assert(cached.exceptAll(fresh).isEmpty && fresh.exceptAll(cached).isEmpty,
      "cached standing drift model drifted from fresh aggregation")
  }

  test("streaming drift telemetry equals the batch statistic, stateless") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat_ws, count, explode, lit}
    // batch twin of the streamed delta side, scored the same way
    val mod = graft.operators.Dedup.IncrementalDeltaMod
    def counts(filter: org.apache.spark.sql.Column) =
      graft.Tables.documents(spark, sf001).filter(filter)
        .select(explode(graft.operators.TextOps.bigramArray).as("bg"))
        .select((graft.functions.TextAnalysis.fingerprint(
          concat_ws(" ", col("bg.w1"), col("bg.w2")))
          % graft.operators.Retrieval.DsirDim).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val expected = graft.operators.Introspect.driftStat(
        counts(col("doc_id") % mod === 0),
        counts(col("doc_id") % mod =!= 0))
      .head.getLong(0)
    val got = graft.operators.StreamingOps.streamDrift
      .build(spark, sf001).collect()
    assert(got.length === 1)
    assert(got(0).getLong(1) === expected,
      "streamed bucket log diverged from the batch statistic")
    val active = spark.streams.active.filter(_.name != null)
      .find(_.name.startsWith("q_stream_drift"))
    assert(active.nonEmpty)
    assert(active.get.lastProgress.stateOperators.isEmpty,
      s"expected zero stateful operators: ${active.get.lastProgress.json}")
  }

  test("streaming DSIR scoring equals the batch selection op, stateless") {
    import spark.implicits._
    val batch = graft.operators.Retrieval.dsirWeights.build(spark, sf001)
      .select($"doc_id", $"dsir_score", $"kept")
      .as[(Long, Long, Boolean)].collect().toSet
    val got = graft.operators.StreamingOps.streamDsir
      .build(spark, sf001)
      .select($"doc_id", $"dsir_score", $"kept")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(batch.nonEmpty, "expected scored docs in testdata")
    assert(got === batch)
    val active = spark.streams.active.find(
      q => q.name != null && q.name.startsWith("q_stream_dsir_mem"))
    assert(active.nonEmpty)
    assert(active.get.lastProgress.stateOperators.isEmpty,
      s"expected zero stateful operators: ${active.get.lastProgress.json}")
  }

  test("streaming BPE encode equals the batch encode op, stateless") {
    import spark.implicits._
    val batch = graft.operators.Bpe.bpeEncode.build(spark, sf001)
      .select($"doc_id", $"n_words", $"n_chars", $"n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    val got = graft.operators.StreamingOps.streamBpeEncode
      .build(spark, sf001)
      .select($"doc_id", $"n_words", $"n_chars", $"n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "expected encoded delta docs in testdata")
    assert(got === batch)
    val active = spark.streams.active.find(
      q => q.name != null && q.name.startsWith("q_stream_bpe_encode_mem"))
    assert(active.nonEmpty)
    assert(active.get.lastProgress.stateOperators.isEmpty,
      s"expected zero stateful operators: ${active.get.lastProgress.json}")
  }

  test("streaming token-id emission equals the batch dataloader " +
    "artifact (identity AND order), stateless") {
    import spark.implicits._
    val batch = graft.operators.Bpe.bpeTokens.build(spark, sf001)
      .select($"doc_id", $"n_tokens", $"n_unk", $"ids_fp")
      .as[(Long, Long, Long, Long)].collect().toSet
    val got = graft.operators.StreamingOps.streamBpeTokens
      .build(spark, sf001)
      .select($"doc_id", $"n_tokens", $"n_unk", $"ids_fp")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "expected tokenized delta docs in testdata")
    assert(got === batch)
    val active = spark.streams.active.find(
      q => q.name != null && q.name.startsWith("q_stream_bpe_tokens_mem"))
    assert(active.nonEmpty)
    assert(active.get.lastProgress.stateOperators.isEmpty,
      s"expected zero stateful operators: ${active.get.lastProgress.json}")
  }

  test("streaming ANN probe equals the batch kNN graph restricted to arrivals, stateless") {
    import spark.implicits._
    val S = graft.operators.Similarity
    val batch = S.knnGraph.build(spark, sf001)
      .filter($"vec_id" % S.StreamAnnMod === 0)
      .select($"vec_id", $"rank", $"nn_id", $"cos")
      .as[(Long, Long, Long, Double)].collect().toSet
    val got = graft.operators.StreamingOps.streamAnnProbe
      .build(spark, sf001)
      .select($"vec_id", $"rank", $"nn_id", $"cos")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty, "expected arriving probe vectors in testdata")
    assert(got === batch)
    val active = spark.streams.active.find(
      q => q.name != null && q.name.startsWith("q_stream_ann_mem"))
    assert(active.nonEmpty)
    assert(active.get.lastProgress.stateOperators.isEmpty,
      s"expected zero stateful operators: ${active.get.lastProgress.json}")
  }

  test("streaming TRAINED-index probe equals the batch imiDelta op, " +
    "stateless") {
    import spark.implicits._
    val batch = graft.operators.Imi.imiDelta.build(spark, sf001)
      .select($"vec_id", $"rank", $"nn_id", $"cos")
      .as[(Long, Long, Long, Double)].collect().toSet
    val got = graft.operators.StreamingOps.streamAnnTrained
      .build(spark, sf001)
      .select($"vec_id", $"rank", $"nn_id", $"cos")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty, "expected arriving probe vectors in testdata")
    assert(got === batch)
    val active = spark.streams.active.find(
      q => q.name != null && q.name.startsWith("q_stream_ann_tr_"))
    assert(active.nonEmpty)
    assert(active.get.lastProgress.stateOperators.isEmpty,
      s"expected zero stateful operators: ${active.get.lastProgress.json}")
  }

  test("streaming BM25 probe equals the batch retrieval op, stateless") {
    import spark.implicits._
    val batch = graft.operators.TextOps.bm25.build(spark, sf001)
      .select($"qid", $"doc_id", $"score", $"rnk")
      .as[(Long, Long, Long, Long)].collect().toSet
    val got = graft.operators.StreamingOps.streamBm25
      .build(spark, sf001)
      .select($"qid", $"doc_id", $"score", $"rnk")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty, "expected retrieval hits in testdata")
    assert(got === batch)
    val active = spark.streams.active.find(
      q => q.name != null && q.name.startsWith("q_stream_bm25_"))
    assert(active.nonEmpty)
    assert(active.get.lastProgress.stateOperators.isEmpty,
      s"expected zero stateful operators: ${active.get.lastProgress.json}")
  }

  test("stream-stream attribution join buffers across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clickIn = MemoryStream[(Long, Long, Timestamp)]
    val purchIn = MemoryStream[(Long, Long, Timestamp, Long)]
    val clicks = clickIn.toDF()
      .toDF("click_id", "click_user", "click_ts")
      .withWatermark("click_ts", "10 days")
    val purchases = purchIn.toDF()
      .toDF("purchase_id", "user_id", "purchase_ts", "purchase_cents")
      .withWatermark("purchase_ts", "10 days")
    val q = EventStream.attributionJoin(clicks, purchases)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("attr_join").start()
    // batch 1: the purchase arrives FIRST — its matching click is late
    purchIn.addData((100L, 1L, Timestamp.valueOf("2026-01-01 10:00:00"), 2500L))
    q.processAllAvailable()
    assert(spark.table("attr_join").count() === 0)
    // batch 2: in-window click (09:30) joins the buffered purchase;
    // out-of-window click (08:00) and other-user click do not
    clickIn.addData(
      (10L, 1L, Timestamp.valueOf("2026-01-01 09:30:00")),
      (11L, 1L, Timestamp.valueOf("2026-01-01 08:00:00")),
      (12L, 2L, Timestamp.valueOf("2026-01-01 09:45:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attr_join")
      .select($"click_id", $"purchase_id", $"purchase_cents")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((10L, 100L, 2500L)))
  }

  test("thresholdAlerts emits one row per level crossed, none otherwise") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.thresholdAlerts(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("alerts").start()
    // batch 1: user 1 jumps to 2550 cents → crosses 1000 and 2000
    input.addData(
      EventStream.Event(1L, Timestamp.valueOf("2026-01-01 00:00:00"), 25.50),
      EventStream.Event(2L, Timestamp.valueOf("2026-01-01 00:00:30"), 3.00))
    q.processAllAvailable()
    // batch 2: user 1 +200 cents (no crossing), user 2 +800 → crosses 1000
    input.addData(
      EventStream.Event(1L, Timestamp.valueOf("2026-01-01 00:01:00"), 2.00),
      EventStream.Event(2L, Timestamp.valueOf("2026-01-01 00:01:30"), 8.00))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("alerts")
      .select($"user_id", $"total_cents").as[(Long, Long)]
      .collect().sorted.toSeq
    assert(got === Seq((1L, 1000L), (1L, 2000L), (2L, 1000L)))
  }

  test("thresholdAlerts: dip below an alerted level then re-cross stays silent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.thresholdAlerts(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("alerts_hwm").start()
    // +1500 → crosses 1000
    input.addData(EventStream.Event(1L, Timestamp.valueOf("2026-01-01 00:00:00"), 15.00))
    q.processAllAvailable()
    // refund -10.00 → total 500, below the alerted level; no alert
    input.addData(EventStream.Event(1L, Timestamp.valueOf("2026-01-01 00:01:00"), -10.00))
    q.processAllAvailable()
    // +7.00 → total 1200: re-crosses 1000, which already alerted → silent
    input.addData(EventStream.Event(1L, Timestamp.valueOf("2026-01-01 00:02:00"), 7.00))
    q.processAllAvailable()
    // +10.00 → total 2200: crosses 2000 for the first time → one alert
    input.addData(EventStream.Event(1L, Timestamp.valueOf("2026-01-01 00:03:00"), 10.00))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("alerts_hwm")
      .select($"total_cents").as[Long].collect().sorted.toSeq
    assert(got === Seq(1000L, 2000L))
  }

  test("sessionize accumulates per-user state incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(input.toDS(), withTimeout = false)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("sessions").start()
    input.addData(
      EventStream.Event(1L, Timestamp.valueOf("2026-01-01 00:00:00"), 1.00),
      EventStream.Event(1L, Timestamp.valueOf("2026-01-01 00:01:00"), 2.50),
      EventStream.Event(2L, Timestamp.valueOf("2026-01-01 00:02:00"), 0.40))
    q.processAllAvailable()
    input.addData(
      EventStream.Event(1L, Timestamp.valueOf("2026-01-01 00:03:00"), 0.50))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("sessions")
      .groupBy($"user_id")
      .agg(max(struct($"n_events", $"total_cents")).as("s"))
      .select($"user_id", $"s.n_events", $"s.total_cents")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(last === Seq((1L, 3L, 400L), (2L, 1L, 40L)))
  }
}
