package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Money.centsOf

/** Event-time window family over the `events` table: batch tumbling
  * windows (the reference's daily `as_of_date` cadence generalized —
  * SURVEY §2.10), gap-based sessionization (the streaming
  * `mapGroupsWithState` twin, here as a pure window program), and
  * frame-spec moving aggregates (rowsBetween — beyond the reference,
  * which has no frame windows, SURVEY §2.5).
  *
  * Determinism across engines: all time arithmetic happens on epoch
  * MICROSECONDS as BIGINT (the events file has shipped as both ns and
  * µs across driver rounds — both engines agree at µs under either
  * encoding), and every window order is totalized with the row's
  * unique id.
  *
  * Scale notes: sessionization is ONE shuffle on user_id, then two
  * in-partition window passes over the same sort (Catalyst reuses the
  * sort; no second exchange). A 100 TB events table shuffles once and
  * sessions never cross partitions. The tumbling window is a plain
  * groupBy — map-side partial agg makes the shuffle carry only
  * (window, type) partials.
  */
object Windows {

  /** Tumbling 1-hour window aggregate, batch twin of
    * [[graft.streaming.EventStream.windowedAgg]]. */
  val tumblingWindow: Op = Op(
    "q_tumbling_window",
    """SELECT CAST(epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS window_start_us,
      |       event_type,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events
      |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(centsOf(col("value"))).as("value_cents"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("value_cents"))
  }

  /** Gap-based sessionization: a new session starts after >30 min of
    * user inactivity. lag → gap flag → running sum = session index →
    * per-session aggregate. The batch equivalent of per-user streaming
    * state (ref revalueCollection.mjs:57-103's accumulators, lifted to
    * event time).
    */
  val sessionizeBatch: Op = Op(
    "q_sessionize",
    """WITH ev AS (
      |  SELECT user_id, event_id,
      |         CAST(epoch_us(ts) AS BIGINT) AS us,
      |         CAST(ROUND(value*100) AS BIGINT) AS cents
      |  FROM events
      |), flagged AS (
      |  SELECT *,
      |         CASE WHEN lag(us) OVER w IS NULL
      |                OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
      |), numbered AS (
      |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM flagged
      |)
      |SELECT user_id, session_idx,
      |       COUNT(*) AS n_events,
      |       MIN(us) AS start_us,
      |       MAX(us) AS end_us,
      |       MAX(us) - MIN(us) AS dur_us,
      |       CAST(SUM(cents) AS BIGINT) AS value_cents
      |FROM numbered
      |GROUP BY user_id, session_idx""".stripMargin) { (spark, dir) =>
    val GapUs = 1800000000L // 30 min
    val ev = Tables.events(spark, dir).select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"),
      centsOf(col("value")).as("cents"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val flagged = ev.withColumn("new_sess",
      when(lag(col("us"), 1).over(w).isNull ||
        col("us") - lag(col("us"), 1).over(w) > GapUs, 1).otherwise(0))
    val numbered = flagged.withColumn("session_idx",
      sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
    numbered.groupBy(col("user_id"), col("session_idx")).agg(
      count(lit(1)).as("n_events"),
      min(col("us")).as("start_us"),
      max(col("us")).as("end_us"),
      (max(col("us")) - min(col("us"))).as("dur_us"),
      sum(col("cents")).as("value_cents"))
  }

  /** Frame-spec windows: 3-row moving sum + lag/lead per customer order
    * history (rowsBetween(-2, 0)); sums stay integer cents so the frame
    * aggregate is exact under any execution order.
    */
  val movingAgg: Op = Op(
    "q_moving_agg",
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
      |         CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents
      |  FROM orders
      |)
      |SELECT o_custkey, o_orderkey, od, cents,
      |       lag(cents) OVER w AS prev_cents,
      |       lead(cents) OVER w AS next_cents,
      |       CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey
      |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum3_cents,
      |       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey
      |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n3
      |FROM o
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY od, o_orderkey)""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"),
      to_date(col("o_orderdate")).as("od"),
      centsOf(col("o_totalprice")).as("cents"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("od"), col("o_orderkey"))
    val frame = w.rowsBetween(-2, Window.currentRow)
    o.select(col("o_custkey"), col("o_orderkey"), col("od"), col("cents"),
      lag(col("cents"), 1).over(w).as("prev_cents"),
      lead(col("cents"), 1).over(w).as("next_cents"),
      sum(col("cents")).over(frame).as("sum3_cents"),
      count(lit(1)).over(frame).as("n3"))
  }

  /** Trailing time-RANGE window frame: per event, count and cents-sum of
    * the same user's events in the preceding hour (inclusive) — the
    * point-in-time trailing-window feature of a feature store, distinct
    * from [[movingAgg]]'s ROWS frame (a RANGE frame is defined by the
    * ORDER-BY value, so it handles irregular event spacing and treats
    * equal timestamps as peers).
    *
    * Cross-engine determinism: both engines order and frame on epoch
    * MICROSECONDS as plain integers — under the ns file encoding Spark
    * truncates to µs while DuckDB keeps ns, so framing on the raw
    * timestamp would disagree at sub-µs boundaries;
    * `epoch_us`/`unix_micros` pin identical frames either way.
    * Sums are integer cents (order-independent).
    *
    * Scale: one shuffle on user_id, one sort per partition — the RANGE
    * frame is evaluated with a sliding two-pointer pass, linear per
    * user regardless of window width.
    */
  val timeRangeWindow: Op = Op(
    "q_time_range_window",
    """SELECT event_id, user_id,
      |       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
      |       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin) { (spark, dir) =>
    val ev = Tables.events(spark, dir).select(
      col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("t_us"),
      centsOf(col("value")).as("cents"))
    val frame = Window.partitionBy(col("user_id")).orderBy(col("t_us"))
      .rangeBetween(-3600000000L, Window.currentRow)
    ev.select(col("event_id"), col("user_id"),
      count(lit(1)).over(frame).as("n_1h"),
      sum(col("cents")).over(frame).as("cents_1h"))
  }

  /** Trailing 7-day active users per day — the sliding DISTINCT count.
    * Unlike sums, distinct does NOT decompose into window partials, so
    * the scalable shape is NOT a window frame over raw events: first
    * collapse events to (user, day) — the aggregate that shrinks 100 TB
    * of events to |users|×|days| rows — then day-grid-explode each row
    * over the 7 report days it contributes to (map-only ×7), and
    * count distinct users per report day. Report days with no trailing
    * activity simply don't appear; days past the last event day keep
    * their (shrinking) trailing windows, mirroring a daily report run.
    * The same decomposition is how [[AsOf.rangeJoin]] handles additive
    * range aggs — here the pre-collapse is what makes DISTINCT safe. */
  val rollingActiveUsers: Op = Op(
    "q_rolling_active_users",
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |), ex AS (
      |  SELECT user_id, day + CAST(i AS INTEGER) AS report_day
      |  FROM ud, unnest(range(0, 7)) AS t(i)
      |)
      |SELECT report_day, COUNT(DISTINCT user_id) AS active_7d
      |FROM ex GROUP BY 1""".stripMargin) { (spark, dir) =>
    rollingActive(Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")))
  }

  /** [[rollingActiveUsers]] kernel over (user_id, day) rows. */
  def rollingActive(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    ev.distinct()
      .select(col("user_id"), col("day"),
        explode(sequence(lit(0), lit(6))).as("i"))
      .select(col("user_id"), expr("date_add(day, i)").as("report_day"))
      .groupBy(col("report_day"))
      .agg(countDistinct(col("user_id")).as("active_7d"))

  /** Time-series densification + forward fill — the feature-store
    * resampling primitive: a per-user daily value series has holes on
    * inactive days; training features need a dense grid with
    * last-known-value carry-forward (the batch twin of the as-of
    * join's carry semantics, but GENERATING the missing rows instead
    * of aligning two existing tables).
    *
    * Shape at scale: the day grid explodes from the per-user span
    * AGGREGATE (|users| rows), never from raw events — grid size is
    * |users| × span-days regardless of event volume; the carry is one
    * `last(ignoreNulls)` running frame over the grid, partitioned by
    * user (same single shuffle the grid join already needs, and AQE
    * co-plans them). Cents stay integer end-to-end — a DOUBLE daily
    * sum would be reduction-order-dependent and break the oracle.
    *
    * Each user's grid spans their OWN [min, max] day (not the corpus
    * span): a user first seen in March must not fabricate January
    * rows, and the first grid day always has data, so the fill never
    * emits null. */
  val gapFill: Op = Op(
    "q_gap_fill",
    """WITH d AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2
      |), span AS (
      |  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM d GROUP BY 1
      |), grid AS (
      |  SELECT span.user_id, CAST(u.day AS DATE) AS day
      |  FROM span, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(day)
      |), j AS (
      |  SELECT g.user_id, g.day, d.cents
      |  FROM grid g LEFT JOIN d ON g.user_id = d.user_id AND g.day = d.day
      |)
      |SELECT user_id, day,
      |  last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS cents_filled,
      |  cents IS NULL AS is_gap
      |FROM j""".stripMargin) { (spark, dir) =>
    val d = Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(centsOf(col("value"))).as("cents"))
    val grid = d.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(d, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        last(col("cents"), ignoreNulls = true).over(w).as("cents_filled"),
        col("cents").isNull.as("is_gap"))
  }
}
