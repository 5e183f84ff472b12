package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The learned quality scorer's laws: the trained gate must be a real
  * classifier (non-degenerate, close to its teacher), the persisted
  * model must equal a fresh training run, and the capstone wiring must
  * be the plain conjunction it claims. */
class QualityModelSpec extends SparkSpec {

  test("trained gate is non-degenerate and agrees with the heuristic " +
    "teacher on >= 85% of documents") {
    import spark.implicits._
    val scored = QualityModel.qualityScore.build(spark, sf001)
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val n = scored.size
    val kept = scored.values.count(identity)
    assert(n > 0)
    assert(kept > 0 && kept < n,
      s"degenerate scorer: kept $kept of $n")
    // the teacher: P25 token gate AND integer repetition rule — exactly
    // the label law the trainer optimizes
    val d = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        graft.functions.TextAnalysis.bpeishTokenCount(col("text"))
          .cast("long").as("n_tokens"))
    val p25 = d.agg(expr("percentile(n_tokens, 0.25)")).head().getDouble(0)
    val nW = size(split(lower(trim(col("text"))), "[ \\t\\n\\x0B\\f\\r]+"))
    val n3 = greatest(nW - 2, lit(0)).cast("long")
    val nd3 = when(nW >= 3,
      size(graft.functions.TextAnalysis.wordShingles(col("text"), 3))
        .cast("long")).otherwise(0L)
    val teacher = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        graft.functions.TextAnalysis.bpeishTokenCount(col("text"))
          .cast("long").as("n_tokens"),
        n3.as("n3"), nd3.as("nd3"))
      .select(col("doc_id"),
        (col("n_tokens") >= p25 && (col("n3") === 0L ||
          expr("(100 * (n3 - nd3)) div n3") <= QualityModel.RepPctMax))
          .as("y"))
      .as[(Long, Boolean)].collect().toMap
    val agree = teacher.count { case (id, y) => scored(id) == y }
    assert(agree.toDouble / n >= 0.85,
      s"teacher agreement ${agree.toDouble / n} < 0.85 ($agree/$n)")
  }

  test("persisted model == a fresh training run (store parity), and " +
    "weights are nonzero only") {
    import spark.implicits._
    val persisted = QualityModel.standingModel(spark, sf001)
      .as[(Long, Long)].collect().sorted.toSeq
    val fresh = QualityModel.trainWeights(spark, sf001)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(persisted.nonEmpty)
    assert(persisted === fresh)
    assert(persisted.forall(_._2 != 0))
    // the stat features actually trained: bias + token-count weights
    val buckets = persisted.map(_._1).toSet
    assert(buckets.contains(-2L),
      "token-count feature has zero weight — the teacher's main " +
        "signal was not learned")
  }

  test("row-local streaming scorer == the batch scorer, row for row " +
    "(the per-token fold equals the per-bucket group-by exactly)") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"margin", $"keep")
        .as[(Long, Long, Boolean)].collect().sorted.toSeq
    val stream = rows(StreamingOps.streamQuality.build(spark, sf001))
    val batch = rows(QualityModel.qualityScore.build(spark, sf001))
    assert(stream.nonEmpty)
    assert(stream === batch)
    // the headline claim is a PLAN property, not a row property: the
    // arrival-time scorer must hold no state store (the sibling
    // stateless legs gate this in EventStreamSpec — same gate here so
    // a future group-by on the stream side fails loudly)
    val active = spark.streams.active.filter(_.name != null)
      .find(_.name.startsWith("q_stream_quality_mem"))
    assert(active.nonEmpty, "live quality-score query not found")
    assert(active.get.lastProgress.stateOperators.isEmpty,
      s"expected zero stateful operators: ${active.get.lastProgress.json}")
  }

  test("scored capstone is the conjunction of the heuristic gate and " +
    "the learned gate, row for row") {
    import spark.implicits._
    val out = QualityModel.cleanCorpusScored.build(spark, sf001)
      .as[(Long, Boolean, Boolean, Boolean)].collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r._4 == (r._2 && r._3)))
    // the learned gate changes something relative to the heuristic
    // alone — otherwise the stage is dead weight on this corpus
    assert(out.exists(r => r._2 != r._3),
      "learned gate identical to heuristic gate on every doc")
  }
}
