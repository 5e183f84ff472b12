package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness (not part of the engine surface): the WHOLE-REGISTRY
  * decade soak (r12 verdict #1). Times every registered op at two
  * scale factors back-to-back and prints the per-op scaling exponent
  *
  *   exponent = ln(tBig / tSmall) / ln(ratio)
  *
  * so an expected-linear op reads ~1.0, a log-linear shuffle ~1.0-1.2,
  * and anything quadratic reads ~2. Back-to-back small/big timing per
  * op keeps host-steal noise from landing on only one side of the
  * ratio. Sub-150 ms small-side times are flagged `overhead` — at that
  * scale fixed per-query cost (plan + task launch on 32 threads)
  * dominates and the exponent is not a statement about the data path.
  *
  * The quadratic-contract trio is EXPECTED to trip its candidate-budget
  * guard on a replicated twin (identical text values across copies make
  * blocking groups 10x bigger, so the pair contract itself goes 100x —
  * exactly what the r12 guard exists to catch); a guard abort is
  * recorded as `GUARD` and counts as the op's documented scale answer,
  * with the scale-safe sibling's measured exponent standing in.
  *
  * `runMain graft.tools.SoakRegistry <smallDir> <bigDir> [ratio]
  *    [only=a,b,c]`
  */
object SoakRegistry {
  def main(args: Array[String]): Unit = {
    val small = args(0)
    val big = args(1)
    val ratio = args.lift(2).filterNot(_.contains("=")).map(_.toDouble)
      .getOrElse(10.0)
    val only: Option[Set[String]] = args.find(_.startsWith("only="))
      .map(_.stripPrefix("only=").split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.EngineConf.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = graft.SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .sortBy(_._1)

    // warmup at the smallest SF on disk: JIT + codegen cache + parquet
    // footers, same discipline as graft.Bench
    val warmDir = {
      val d = "/root/testdata/sf0.001"
      if (new java.io.File(d).isDirectory) d else small
    }
    qs.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }

    sealed trait Outcome
    case class Timed(s: Double) extends Outcome
    case object Guard extends Outcome
    case class Failed(msg: String) extends Outcome

    def best2(name: String, dir: String): Outcome = {
      def once(): Outcome = {
        val t0 = System.nanoTime()
        try {
          graft.SparkEntry.queries(name)(spark, dir).count()
          Timed((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: IllegalStateException
              if e.getMessage != null &&
                e.getMessage.contains("quadratic-contract budget") =>
            Guard
          case e: Throwable =>
            Failed(Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.next().take(160))
        }
      }
      (once(), once()) match {
        case (Timed(a), Timed(b)) => Timed(math.min(a, b))
        case (Timed(a), _) => Timed(a)
        case (_, Timed(b)) => Timed(b)
        case (g @ Guard, _) => g
        case (f, _) => f
      }
    }

    val sb = new StringBuilder
    var failures = 0
    qs.foreach { case (name, _) =>
      val ts = best2(name, small)
      val tb = best2(name, big)
      val line = (ts, tb) match {
        case (Timed(a), Timed(b)) =>
          val exp = math.log(b / a) / math.log(ratio)
          val flag =
            if (a < 0.15) "overhead"
            else if (exp > 1.2) "HOT"
            else ""
          f"$name%-28s ${a}%8.3f ${b}%8.3f  exp=${exp}%5.2f  $flag"
        case (Timed(a), Guard) =>
          f"$name%-28s ${a}%8.3f    GUARD  (candidate budget fired at big SF)"
        case (_, Failed(m)) =>
          failures += 1; f"$name%-28s  BIG-FAILED: $m"
        case (Failed(m), _) =>
          failures += 1; f"$name%-28s  SMALL-FAILED: $m"
        case (Guard, _) =>
          failures += 1; f"$name%-28s  GUARD AT SMALL SF (unexpected)"
      }
      println(s"[soak] $line")
      sb.append(line).append('\n')
    }
    // persist: stdout tails get truncated on long runs
    val w = new java.io.PrintWriter("/tmp/soak_registry.txt")
    try w.print(sb.toString) finally w.close()
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
