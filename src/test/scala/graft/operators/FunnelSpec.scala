package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Funnel ordering semantics on crafted users — the corpus oracle can
  * only pin aggregate counts, not WHICH orderings qualify. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, String)]) =
    rows.toDF("user_id", "event_type", "tss")
      .select($"user_id", $"event_type", to_timestamp($"tss").as("ts"))

  private def stages(rows: Seq[(Long, String, String)]): Map[Int, Long] =
    Analytics.funnelStages(ev(rows))
      .select($"step", $"n_users").as[(Int, Long)].collect().toMap

  test("full ordered path counts at every step") {
    val s = stages(Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00")))
    assert(s === Map(1 -> 1L, 2 -> 1L, 3 -> 1L))
  }

  test("click BEFORE the first view does not advance the funnel") {
    val s = stages(Seq(
      (1L, "click", "2024-01-01 09:00:00"), // pre-view click ignored
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "purchase", "2024-01-01 11:00:00"))) // no qualifying click
    assert(s === Map(1 -> 1L, 2 -> 0L, 3 -> 0L))
  }

  test("simultaneous click at the first-view timestamp is excluded (strict >)") {
    val s = stages(Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00")))
    assert(s === Map(1 -> 1L, 2 -> 0L, 3 -> 0L))
  }

  test("later qualifying click rescues the step; purchase must follow IT") {
    val s = stages(Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 09:00:00"),  // too early
      (1L, "click", "2024-01-01 10:30:00"),  // qualifies, t2 = 10:30
      (1L, "purchase", "2024-01-01 10:15:00"))) // before t2 → step 3 fails
    assert(s === Map(1 -> 1L, 2 -> 1L, 3 -> 0L))
  }

  test("steps never exceed the previous step across users") {
    val s = stages(Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 10:05:00"),
      (3L, "view", "2024-01-01 10:00:00"),
      (4L, "purchase", "2024-01-01 10:00:00"))) // never viewed
    assert(s === Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }
}
