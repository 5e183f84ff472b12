package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness (PERF round-11, verdict task #7): the 10M-vector IMI
  * soak — one decade past the 1M soak — plus the HOT-CELL skew stress.
  *
  * What it measures:
  *  1. the occupancy law and candidate-volume exponent at 10M
  *     (k1 = ⌈√(N/occ)⌉ → 1000 per half at N = 10M);
  *  2. skew immunity of the CELL AGGREGATION layer: with one vector
  *     duplicated ×10⁵ (every copy lands in the same probed cells, so
  *     one cell holds ~10⁵ members) the occupancy group-by and the
  *     candidate-volume count must run in ~uniform time — they are
  *     algebraic aggregates, so map-side partial combine collapses the
  *     hot key to one row per task before the shuffle (the same
  *     argument `Spans` makes for a 10⁹-duplicated window; this is the
  *     measured row behind it).
  *
  * Candidate volume at 10M is counted COMBINATORIALLY — Σ over probed
  * cells of m·(m−1)/2 — never materialized: the 1M soak's distinct
  * pair set was already 1.22B rows, and a decade up it would blow the
  * disk budget. Run `calib` mode at 1M to measure the multiplicity
  * count next to the known distinct count, so the exponent read off
  * the multiplicity metric is calibrated against r10's distinct-pair
  * row.
  *
  * Usage (separate invocations so each JVM's spills are reclaimed):
  *   SPARK_DRIVER_MEM=64g sbt "runMain graft.tools.ImiTenMSoak 10000000 uniform"
  *   SPARK_DRIVER_MEM=64g sbt "runMain graft.tools.ImiTenMSoak 10000000 hot"
  *   SPARK_DRIVER_MEM=64g sbt "runMain graft.tools.ImiTenMSoak 1000000 calib"
  */
object ImiTenMSoak {
  def main(args: Array[String]): Unit = {
    val nVecs = args.lift(0).map(_.toInt).getOrElse(10000000)
    val mode = args.lift(1).getOrElse("uniform")
    val occ = args.lift(2).map(_.toInt).getOrElse(10)
    val hotCopies = 100000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Imi
    import graft.operators.Similarity.{inorm2, quantize}

    val dim = 64
    def genQuantized(n: Int): DataFrame =
      spark.range(n.toLong).select(col("id").as("vec_id"),
        (col("id") % 10).as("label"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          ((pmod(xxhash64(col("id") * dim + j), lit(1000000L))
            .cast("double") / 1e6) - 0.5).cast("float")).as("embedding"))
        .select(col("vec_id"), col("label"),
          quantize(col("embedding")).as("v"))
        .withColumn("n2", inorm2(spark, col("v")))
        .filter(col("n2") > 0)

    // hot mode: vector 0 duplicated hotCopies times under fresh ids —
    // every copy scores identically, so they share probed cells
    val base = genQuantized(nVecs)
    val e = (if (mode == "hot")
      base.unionByName(spark.range(hotCopies.toLong)
        .select((col("id") + nVecs.toLong).as("vec_id"))
        .crossJoin(broadcast(base.filter(col("vec_id") === 0)
          .select(col("label"), col("v"), col("n2")))))
    else base).localCheckpoint()
    val n = e.count()
    val k1 = math.ceil(math.sqrt(nVecs.toDouble / occ)).toInt
    val np = Imi.NProbeHalf
    println(s"[soak10m] N=$n mode=$mode k1=$k1 nprobe=$np occ_target=$occ")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[soak10m] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    val cb = timed("train codebook (1 Lloyd step)") {
      Imi.codebook(spark, Imi.halves(spark, e), k1, Imi.LloydSteps)
        .localCheckpoint()
    }
    val cells = timed("assign (probed cells)") {
      Imi.cellsWithCodebook(spark, e, cb, np)
        .select(col("vec_id"), col("cell"), col("r0"), col("r1"))
        .localCheckpoint()
    }
    val nCells = cells.count()
    println(s"[soak10m] probed-cell rows = $nCells (want N*np^2 = " +
      s"${n * np * np})")

    // occupancy of the top-1 assignment — the algebraic group-by the
    // skew stress targets
    val occRow = timed("top-1 occupancy group-by") {
      cells.filter(col("r0") === 1 && col("r1") === 1)
        .groupBy(col("cell")).agg(count(lit(1)).as("m"))
        .agg(avg(col("m")).as("avg"), expr("percentile(m, 0.99)").as("p99"),
          max(col("m")).as("mx"), count(lit(1)).as("cells")).collect()(0)
    }
    println(f"[soak10m] top-1 occupancy avg=${occRow.getDouble(0)}%.1f " +
      f"p99=${occRow.getDouble(1)}%.0f max=${occRow.getLong(2)} over " +
      f"${occRow.getLong(3)} live cells")

    // candidate volume, combinatorial: sum over probed cells of
    // m*(m-1)/2 — counts pair multiplicity without materializing pairs
    val candMult = timed("candidate volume (per-cell count)") {
      cells.groupBy(col("cell")).agg(count(lit(1)).as("m"))
        .agg(sum(expr("(m * (m - 1)) div 2")).as("s")).collect()(0)
        .getLong(0)
    }
    println(s"[soak10m] candidate multiplicity = $candMult (per vector ≈ " +
      f"${candMult.toDouble / n}%.1f)")

    if (mode == "calib") {
      // distinct pair count at calibration scale only (1M ≈ 1.2B rows)
      val candDistinct = timed("candidate volume (distinct pairs)") {
        val c = cells.select(col("cell"), col("vec_id"))
        c.alias("a").join(c.alias("b"),
          col("a.cell") === col("b.cell") &&
            col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("s"), col("b.vec_id").as("d"))
          .distinct().count()
      }
      println(s"[soak10m] candidate distinct = $candDistinct " +
        f"(multiplicity/distinct = ${candMult.toDouble / candDistinct}%.3f)")
    }
    spark.stop()
  }
}
