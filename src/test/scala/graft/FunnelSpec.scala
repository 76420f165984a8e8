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
      // null user / null ts rows drop up front (a null user is not a
      // user; a null ts can't order) — must not crash or form a group
      .unionByName(Seq[(java.lang.Long, java.lang.Long, String)](
        (null, 10L, "view"), (6L, null, "view"))
        .toDF("user_id", "ts", "event_type"))
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

  test("maxEventsPerUser: bot user bounded, normal users exact, capped depth is a lower bound") {
    // normal users (per-step counts <= cap) + one bot with 100k step
    // events — the uncapped path would collect all 100k into one list;
    // the capped path's per-user state is <= k*cap rows at every stage
    val normals = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),
      (2L, 10L, "click"), (2L, 20L, "view"),
      (3L, 10L, "view"), (3L, 10L, "click"))
    // bot: 100k interleaved view/click and one final buy — the true
    // chain (view@0, click@1, buy@200000) lives in the earliest events
    // of each step, so the capped depth must still be exactly 3
    val bot = (0 until 100000).map(i =>
      (99L, i.toLong, if (i % 2 == 0) "view" else "click")) :+
      (99L, 200000L, "buy")
    val ev = (normals ++ bot).toDF("user_id", "ts", "event_type")
    val capped = Funnel.depths(ev, "user_id", "ts", "event_type", steps,
        maxEventsPerUser = Some(8))
      .as[(Long, Long)].collect().toMap
    assert(capped == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 99L -> 3L))
    // reach rides the same guard
    val r = Funnel.reach(ev, "user_id", "ts", "event_type", steps,
        maxEventsPerUser = Some(8))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1, "view", 4L), (2, "click", 2L), (3, "buy", 2L)))
    // the documented stall: step-2 events all EARLIER than the step-1
    // match except ones beyond the cap -> capped depth undercounts
    // (lower bound), never overcounts
    val stall = ((1 to 100).map(i => (7L, i.toLong, "click")) :+
      (7L, 50L, "view")).toDF("user_id", "ts", "event_type")
    val stallTrue = Funnel.depths(stall, "user_id", "ts", "event_type", steps)
      .as[(Long, Long)].collect().toMap
    val stallCapped = Funnel.depths(stall, "user_id", "ts", "event_type", steps,
        maxEventsPerUser = Some(3))
      .as[(Long, Long)].collect().toMap
    assert(stallTrue(7L) == 2L && stallCapped(7L) == 1L)
    // plan shape: the bounded heap partial-aggregates map-side (two
    // graft_bottomk phases around the user exchange), and no collect_list
    // of the raw event stream survives anywhere
    val plan = Funnel.depths(ev, "user_id", "ts", "event_type", steps,
        maxEventsPerUser = Some(8))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_bottomk"), plan)
    assert(!plan.contains("collect_list"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("cohortRetention: first-period cohorts, offsets count returning users") {
    // period length 10: u1 first at period 1, returns at 2 and 4;
    // u2 first at period 1, never returns; u3 first at period 2
    val ev = Seq(
      (1L, 10L), (1L, 12L), (1L, 25L), (1L, 44L),
      (2L, 15L),
      (3L, 20L), (3L, 29L)
    ).toDF("user_id", "tsm")
    val r = Funnel.cohortRetention(ev, "user_id", "tsm", periodLength = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(r == Set(
      (1L, 0L, 2L), // cohort 1: u1, u2
      (1L, 1L, 1L), // u1 at period 2
      (1L, 3L, 1L), // u1 at period 4
      (2L, 0L, 1L)  // cohort 2: u3 (both its events in period 2 dedup)
    ))
  }

  test("topPaths: windows per user in (ts, tie) order; sub-n users drop; k cuts with a total order") {
    val ev = Seq(
      // u1: a b c d -> paths "a b c", "b c d"
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "c"), (1L, 40L, 4L, "d"),
      // u2: a b c -> "a b c" (tie at ts 20 resolved by tie col: b before c)
      (2L, 10L, 5L, "a"), (2L, 20L, 6L, "b"), (2L, 20L, 7L, "c"),
      // u3: only 2 events -> nothing
      (3L, 10L, 8L, "a"), (3L, 20L, 9L, "b")
    ).toDF("user_id", "tsm", "eid", "et")
    val out = Funnel.topPaths(ev, "user_id", "tsm", "et", "eid", n = 3, k = 10)
      .as[(String, Long)].collect().toSet
    assert(out == Set(("a b c", 2L), ("b c d", 1L)))
    val k1 = Funnel.topPaths(ev, "user_id", "tsm", "et", "eid", n = 3, k = 1)
      .as[(String, Long)].collect().toSeq
    assert(k1 == Seq(("a b c", 2L)))
  }

  test("transitionMatrix: per-user adjacent pairs, row-normalized ppm, tie order pinned") {
    val ev = Seq(
      // u1: a b a c → (a,b) (b,a) (a,c)
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"), (1L, 40L, 4L, "c"),
      // u2: a b (tie at ts 20 → eid orders b before c): a b c → (a,b) (b,c)
      (2L, 10L, 5L, "a"), (2L, 20L, 6L, "b"), (2L, 20L, 7L, "c"),
      // u3: single event → no pairs
      (3L, 10L, 8L, "a")
    ).toDF("user_id", "tsm", "eid", "et")
    val got = Funnel.transitionMatrix(ev, "user_id", "tsm", "et", "eid")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Long)].collect().toSeq
    // from a: (a,b)=2, (a,c)=1 → row total 3 → 666666 / 333333
    // from b: (b,a)=1, (b,c)=1 → 500000 each
    assert(got == Seq(
      ("a", "b", 2L, 666666L),
      ("a", "c", 1L, 333333L),
      ("b", "a", 1L, 500000L),
      ("b", "c", 1L, 500000L)
    ), got.toString)
  }

  test("rollingUserActivity: RANGE frame weighs calendar gaps; per-user isolation") {
    import spark.implicits._
    // user u: 2 events day 1, 1 event day 2, 3 events day 9 (a gap a
    // ROWS frame would ignore); user v: 1 event day 2
    val ev = Seq(
      ("u", 1L), ("u", 1L), ("u", 2L), ("u", 9L), ("u", 9L), ("u", 9L),
      ("v", 2L)
    ).toDF("uid", "day")
    val got = graft.operators.Funnel
      .rollingUserActivity(ev, "uid", col("day"), window = 7)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("u", 1L, 2L, 2L),
      ("u", 2L, 1L, 3L),  // days 1-2 inside the trailing week
      ("u", 9L, 3L, 3L),  // days 1-2 AGED OUT (range 3..9) — the gap matters
      ("v", 2L, 1L, 1L)   // other users never leak in
    ), got.toString)
    intercept[IllegalArgumentException] {
      graft.operators.Funnel.rollingUserActivity(ev, "uid", col("day"), 0)
    }
  }
}
