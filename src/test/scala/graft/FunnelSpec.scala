package graft

import org.apache.spark.sql.functions._
import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "buy")

  test("depths: strict ordered progress; equal timestamps do not advance") {
    val ev = Seq(
      // u1 completes in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
      // u2 clicks BEFORE viewing — that click can't count; no later click
      (2L, 10L, "click"), (2L, 20L, "view"),
      // u3: click at the SAME ts as view — strict > rejects it
      (3L, 10L, "view"), (3L, 10L, "click"),
      // u4: out-of-funnel types only — no row at all
      (4L, 10L, "error"),
      // u5: backtracking re-view then a later full run
      (5L, 10L, "view"), (5L, 20L, "click"), (5L, 15L, "view"), (5L, 25L, "buy")
    ).toDF("user_id", "ts", "event_type")
    val d = Funnel.depths(ev, "user_id", "ts", "event_type", steps)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 5L -> 3L))
  }

  test("reach: one row per step, zero-reach steps survive; plan is one user shuffle") {
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"),
      (2L, 10L, "view")
    ).toDF("user_id", "ts", "event_type")
    val r = Funnel.reach(ev, "user_id", "ts", "event_type", steps)
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1, "view", 2L), (2, "click", 1L), (3, "buy", 0L)))
    // scan filter on the step types pushes down; exactly one exchange
    // below the final scalar aggregate (the user groupBy); no Window
    val plan = Funnel.depths(ev, "user_id", "ts", "event_type", steps)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }
}
