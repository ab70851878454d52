package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EventsSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "ts")

  test("funnel: earliest-completion chain per user, partial progress " +
      "keeps nulls, non-starters are absent") {
    val events = ev(
      // user 1 completes: view@10 -> click@20 -> purchase@30; the later
      // view@15 and the pre-view click@5 must not matter
      (1L, "click", 5L), (1L, "view", 10L), (1L, "view", 15L),
      (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2 stops after click; its purchase is BEFORE the click
      (2L, "view", 10L), (2L, "purchase", 12L), (2L, "click", 14L),
      // user 3 never views (clicks/purchases only) -> not in the funnel
      (3L, "click", 1L), (3L, "purchase", 2L))
    val got = Events.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .as[(Long, Long, Option[Long], Option[Long], Int)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      1L -> ((10L, Some(20L), Some(30L), 3)),
      2L -> ((10L, Some(14L), None, 2))), got)
  }

  test("funnel: greedy earliest-first finds a chain whenever one exists " +
      "(the completeness property), and generalizes to k stages") {
    // the ONLY strictly-increasing a->b->c->d chain starts at the FIRST
    // a: a@1 b@2 c@3 d@4; a later a@5 would dead-end. Greedy takes a@1.
    val events = ev(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L), (1L, "d", 4L),
      (1L, "a", 5L))
    val got = Events.funnel(events, "user_id", "event_type", "ts",
      Seq("a", "b", "c", "d"))
      .as[(Long, Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().head
    assert(got == ((1L, 1L, Some(2L), Some(3L), Some(4L), 4)), got)
  }

  test("funnel plan: no window, no sequence sort, no cartesian — skinny " +
      "min-aggregates chained by user-key equi-joins") {
    val events = ev((1L, "view", 1L), (1L, "click", 2L))
    val plan = Events.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click")).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
