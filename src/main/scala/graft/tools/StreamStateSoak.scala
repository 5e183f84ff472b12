package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev harness (not part of the engine surface): the streaming
  * STATE-STORE soak (r12 verdict #6). The stateful streaming ops have
  * semantics specs (streaming == batch twin under any micro-batch
  * split) but nothing had ever MEASURED state growth under a long
  * skewed stream — the 100 TB/day failure mode is a state store that
  * grows with event volume instead of being bounded by the watermark
  * horizon (dedup/join) or key cardinality (mapGroupsWithState).
  *
  * Corpus: `nEvents` (default 5M) over a simulated 30-day span, Zipf
  * user keys (pdf ∝ 1/rank via inverse-CDF `exp(u·ln K)`, so the top
  * key carries ~8% of all events), ~3% late arrivals shifted back
  * 1-4 days (some inside the 2-day watermark — kept; some beyond —
  * dropped, the documented semantics), written as `nFiles` sequential
  * parquet files so `maxFilesPerTrigger=1` replays them as that many
  * micro-batches in event-time order.
  *
  * Four shapes, each driven to a noop sink with per-batch
  * StateOperatorProgress capture:
  *  - `dedup_wm`:   dropDuplicatesWithinWatermark, FIXED 2-day delay
  *                  (the oracle-parity ops derive delay > span so no
  *                  key ever expires; the soak wants eviction LIVE)
  *  - `ss_join`:    the attribution stream-stream join, 2-day delay
  *                  both sides (state = events inside the horizon)
  *  - `mgws`:       the mapGroupsWithState sessionizer — state is one
  *                  entry per DISTINCT KEY ever seen: bounded by key
  *                  cardinality, not event volume (timeout is the
  *                  production eviction; NoTimeout here so
  *                  processAllAvailable settles)
  *  - `session_wm`: Append-mode session_window agg + 2-day watermark —
  *                  the eviction-capable sessionizer (closed sessions
  *                  leave the store as the watermark passes them)
  *
  * The horizon law asserted for the watermarked shapes: state rows at
  * the final batch ≤ `PlateauFactor` × state rows at the half-way
  * batch. Un-evicted state grows ~linearly with events (last ≈ 2×
  * mid); watermark-bounded state plateaus at the horizon population.
  * For `mgws`: final state rows == exact distinct keys (one entry per
  * key, never more).
  *
  * `runMain graft.tools.StreamStateSoak [nEvents] [nFiles] [keys]`
  */
object StreamStateSoak {

  val PlateauFactor = 1.3

  def main(args: Array[String]): Unit = {
    val nEvents = args.lift(0).map(_.toLong).getOrElse(5000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(40)
    val keys = args.lift(2).map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.EngineConf.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.sql.streaming.numRecentProgressUpdates", "400")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = "/tmp/graft_stream_soak"
    val inDir = s"$root/in"
    def rmTree(f: java.io.File): Unit = {
      val children = f.listFiles()
      if (children != null) children.foreach(rmTree)
      f.delete(): Unit
    }
    rmTree(new java.io.File(root))

    // ---- corpus generation: nFiles sequential writes, event time
    // advancing file-by-file so the watermark marches with the replay
    val spanDays = 30.0
    val epochUs = java.time.Instant.parse("2025-01-01T00:00:00Z")
      .toEpochMilli * 1000L
    val perFile = nEvents / nFiles
    val fileSpanUs = (spanDays * 86400e6 / nFiles).toLong
    println(s"[soak] generating $nEvents events / $nFiles files / " +
      s"$keys Zipf keys at $inDir")
    (0 until nFiles).foreach { k =>
      spark.range(k * perFile, (k + 1) * perFile)
        .select(
          col("id").as("event_id"),
          // Zipf(1) inverse CDF: exp(u·lnK) ∈ [1, K], pdf ∝ 1/u
          (exp(rand(k + 1) * math.log(keys.toDouble)))
            .cast("long").as("user_id"),
          element_at(array(lit("click"), lit("purchase"), lit("view")),
            (pmod(col("id"), lit(3)) + 1).cast("int")).as("event_type"),
          // base ts inside this file's slice, ~3% shifted back 1-4 days
          timestamp_micros(
            lit(epochUs + k * fileSpanUs) +
              (rand(k + 101) * fileSpanUs).cast("long") -
              when(rand(k + 202) < 0.03,
                ((lit(1.0) + rand(k + 303) * 3.0) * 86400e6).cast("long"))
                .otherwise(lit(0L))).as("ts"),
          round(rand(k + 404) * 20, 2).as("value"))
        .coalesce(1)
        .write.mode("append").parquet(inDir)
    }
    val distinctUsers = spark.read.parquet(inDir)
      .select("user_id").distinct().count()
    println(s"[soak] corpus ready: $distinctUsers distinct users")

    def stream(): DataFrame = {
      val schema = spark.read.parquet(inDir).schema
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir)
    }

    final case class BatchState(batch: Long, input: Long, stateRows: Long,
      stateBytes: Long, removed: Long)

    val report = new StringBuilder
    var failures = List.empty[String]

    /** Drive one shape to a noop sink, return per-batch state metrics.
      * mapGroupsWithState demands Update mode; the rest run Append. */
    def runCase(name: String, mode: String = "append")(
        build: DataFrame => DataFrame): Seq[BatchState] = {
      val ckpt = s"$root/ckpt-$name"
      val q = build(stream())
        .writeStream.format("noop").outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val states = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map { p =>
          val ops = p.stateOperators
          BatchState(p.batchId, p.numInputRows,
            ops.map(_.numRowsTotal).sum,
            ops.map(_.memoryUsedBytes).sum,
            ops.map(_.numRowsRemoved).sum)
        }
      q.stop()
      val mid = states(states.size / 2)
      val last = states.last
      val peak = states.maxBy(_.stateRows)
      val line = f"$name%-12s batches=${states.size}%3d  " +
        f"midRows=${mid.stateRows}%9d  lastRows=${last.stateRows}%9d  " +
        f"peakRows=${peak.stateRows}%9d  peakMB=${peak.stateBytes / 1e6}%8.1f  " +
        f"removedTotal=${states.map(_.removed).sum}%9d"
      println(s"[soak] $line")
      report.append(line).append('\n')
      states
    }

    def assertPlateau(name: String, states: Seq[BatchState]): Unit = {
      val mid = states(states.size / 2).stateRows.toDouble
      val last = states.last.stateRows.toDouble
      if (last > PlateauFactor * mid) {
        val msg = f"$name: state NOT horizon-bounded — last=$last%.0f > " +
          f"$PlateauFactor x mid=$mid%.0f (linear growth shape)"
        println(s"[soak] FAIL $msg"); failures ::= msg
      } else println(f"[soak] $name plateau OK: last/mid = ${last / mid}%.2f")
    }

    // 1. dropDuplicatesWithinWatermark, fixed 2-day horizon
    val dedup = runCase("dedup_wm") { s =>
      s.select(col("ts"), col("user_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("value_cents"))
        .withWatermark("ts", "2 days")
        .dropDuplicatesWithinWatermark("user_id", "event_type", "value_cents")
    }
    assertPlateau("dedup_wm", dedup)

    // 2. stream-stream attribution join, 2-day horizon both sides
    val ssj = runCase("ss_join") { s =>
      val clicks = s.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("click_user"), col("ts").as("click_ts"))
        .withWatermark("click_ts", "2 days")
      val purchases = s.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"),
          round(col("value") * 100).cast("long").as("purchase_cents"))
        .withWatermark("purchase_ts", "2 days")
      graft.streaming.EventStream.attributionJoin(clicks, purchases)
    }
    assertPlateau("ss_join", ssj)

    // 3. mapGroupsWithState sessionizer: key-cardinality-bounded
    val mgws = runCase("mgws", mode = "update") { s =>
      graft.streaming.EventStream.sessionize(
        s.select(col("user_id"), col("ts"), col("value"))
          .as[graft.streaming.EventStream.Event],
        withTimeout = false).toDF()
    }
    val mgwsLast = mgws.last.stateRows
    if (mgwsLast != distinctUsers) {
      val msg = s"mgws: state rows $mgwsLast != distinct keys $distinctUsers"
      println(s"[soak] FAIL $msg"); failures ::= msg
    } else println(s"[soak] mgws state == distinct keys ($distinctUsers) OK")

    // 4. Append-mode session windows + watermark: closed sessions evict
    val sw = runCase("session_wm") { s =>
      s.withWatermark("ts", "2 days")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
        .select(col("user_id"), col("session_window.start").as("start"),
          col("n_events"), col("value_cents"))
    }
    assertPlateau("session_wm", sw)

    // per-batch detail for the PERF write-up
    report.append("\nper-batch detail (dedup_wm / ss_join / session_wm):\n")
    Seq("dedup_wm" -> dedup, "ss_join" -> ssj, "mgws" -> mgws,
      "session_wm" -> sw).foreach { case (n, ss) =>
      ss.zipWithIndex.filter { case (_, i) =>
        i % math.max(1, ss.size / 10) == 0 || i == ss.size - 1 }
        .foreach { case (b, _) =>
          report.append(f"  $n%-12s batch=${b.batch}%3d in=${b.input}%8d " +
            f"state=${b.stateRows}%9d bytes=${b.stateBytes}%12d " +
            f"removed=${b.removed}%9d\n")
        }
    }
    val w = new java.io.PrintWriter("/tmp/stream_state_soak.txt")
    try w.print(report.toString) finally w.close()

    spark.stop()
    if (failures.nonEmpty) {
      println(s"[soak] ${failures.size} FAILURES"); sys.exit(1)
    } else println("[soak] stream-state soak PASS")
  }
}
