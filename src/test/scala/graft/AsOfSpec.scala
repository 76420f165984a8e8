package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, "u1", 100L),
    (2L, "u1", 205L),
    (3L, "u1", 50L),   // before any right row
    (4L, "u2", 100L)   // key with no right rows at all
  ).toDF("id", "user", "t")

  private def right = Seq(
    ("u1", 100L, 10.0, 7L),  // exactly at left #1's ts -> inclusive match
    ("u1", 100L, 99.0, 9L),  // same ts, larger tie-break -> wins
    ("u1", 200L, 20.0, 11L)
  ).toDF("user", "rt", "v", "seq")

  test("backward as-of: inclusive bound, latest-preceding, nulls when nothing precedes") {
    val out = AsOf.joinBackward(left, right, Seq("user"), "t", "rt",
        tieBreak = Some("seq"))
      .select(col("id"), col("matched._t").as("mt"), col("matched.v").as("mv"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(100L), Some(99.0)))) // inclusive + tie-break by seq
    assert(out(2L) == ((Some(200L), Some(20.0))))
    assert(out(3L) == ((None, None)))
    assert(out(4L) == ((None, None)))
  }

  test("tolerance nulls stale matches") {
    val out = AsOf.joinBackward(left, right, Seq("user"), "t", "rt",
        tieBreak = Some("seq"), tolerance = Some(lit(4L)))
      .select(col("id"), col("matched._t").as("mt"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(100L)) // age 0 <= 4
    assert(out(2L).isEmpty)        // age 5 > 4
  }

  test("forward as-of: inclusive bound, earliest-following, nulls when nothing follows") {
    val out = AsOf.joinForward(left, right, Seq("user"), "t", "rt",
        tieBreak = Some("seq"))
      .select(col("id"), col("matched._t").as("mt"), col("matched.v").as("mv"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(100L), Some(99.0)))) // inclusive + same tie-break rule
    assert(out(2L) == ((None, None)))             // nothing at/after 205
    assert(out(3L) == ((Some(100L), Some(99.0)))) // earliest-after, not latest
    assert(out(4L) == ((None, None)))
  }

  test("forward tolerance nulls matches too far ahead") {
    val fwdLeft = Seq((1L, "u1", 95L), (2L, "u1", 150L)).toDF("id", "user", "t")
    val out = AsOf.joinForward(fwdLeft, right, Seq("user"), "t", "rt",
        tieBreak = Some("seq"), tolerance = Some(lit(10L)))
      .select(col("id"), col("matched._t").as("mt"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(100L)) // lookahead 5 <= 10
    assert(out(2L).isEmpty)        // nearest-after is 200: lookahead 50 > 10
  }

  test("nearest as-of: closer side wins, backward wins exact ties, tolerance bounds both") {
    val nl = Seq(
      (1L, "u1", 120L), // back 100 (dist 20) vs fwd 200 (dist 80) -> back
      (2L, "u1", 190L), // back 100 (90) vs fwd 200 (10) -> fwd
      (3L, "u1", 150L), // equidistant (50/50) -> backward convention
      (4L, "u1", 30L),  // nothing before -> fwd 100
      (5L, "u2", 10L)   // no right rows at all
    ).toDF("id", "user", "t")
    val out = AsOf.joinNearest(nl, right, Seq("user"), "t", "rt",
        tieBreak = Some("seq"))
      .select(col("id"), col("matched._t").as("mt"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(100L))
    assert(out(2L).contains(200L))
    assert(out(3L).contains(100L)) // tie -> backward
    assert(out(4L).contains(100L))
    assert(out(5L).isEmpty)
    val tol = AsOf.joinNearest(nl, right, Seq("user"), "t", "rt",
        tieBreak = Some("seq"), tolerance = Some(lit(15L)))
      .select(col("id"), col("matched._t").as("mt"))
      .as[(Long, Option[Long])].collect().toMap
    assert(tol(2L).contains(200L)) // 10 <= 15
    assert(tol(1L).isEmpty)        // 20 > 15 both ways
  }

  test("nearest preserves left rows with null ts or null keys (no recombination join)") {
    // the earlier composed form recombined via an inner equi-join that
    // silently dropped such rows; the single-shuffle form keeps them with
    // the same matched-or-null semantics as the directional joins
    val nl = Seq(
      (1L, Some("u1"), Some(120L)), // normal: back 100 wins
      (2L, Some("u1"), None),       // null ts
      (3L, None, Some(100L))        // null key
    ).toDF("id", "user", "t")
    val out = AsOf.joinNearest(nl, right, Seq("user"), "t", "rt",
        tieBreak = Some("seq"))
      .select(col("id"), col("matched._t").as("mt"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L), "every left row must survive")
    assert(out(1L).contains(100L))
    // a null-ts row has no position in time: matched must be null (the
    // desc window's nulls-last placement would otherwise hand it the
    // minimum-ts right row through the forward candidate)
    assert(out(2L).isEmpty)
    assert(out(3L).isEmpty) // no right rows under a null key
    // same convention in BOTH directional joins (forward is the exposed
    // case — its desc order sorts null ts last, after every right row)
    for (dir <- Seq("fwd", "back")) {
      val d = if (dir == "fwd")
        AsOf.joinForward(nl, right, Seq("user"), "t", "rt", tieBreak = Some("seq"))
      else
        AsOf.joinBackward(nl, right, Seq("user"), "t", "rt", tieBreak = Some("seq"))
      val m = d.select(col("id"), col("matched._t").as("mt"))
        .as[(Long, Option[Long])].collect().toMap
      assert(m(2L).isEmpty, s"$dir: null-ts row must match nothing")
      assert(m.keySet == Set(1L, 2L, 3L), s"$dir: rows preserved")
    }
  }

  test("one shuffle per side: the plan sorts within key partitions, no range join") {
    val q = AsOf.joinBackward(left, right, Seq("user"), "t", "rt")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan) // tagged union, not a join at all
    assert(plan.contains("Window"), plan)
  }

  test("nearest is ONE key shuffle: two windows share the exchange, no join") {
    val q = AsOf.joinNearest(left, right, Seq("user"), "t", "rt")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val shuffles = "Exchange".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly 1 Exchange, got $shuffles:\n$plan")
  }

  test("snapshotAt: latest row per key at the cutoff, ties by tieBreak; no window sort") {
    val log = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"), (1L, 20L, 102L, "c"),
      (1L, 30L, 103L, "late"),
      (2L, 40L, 104L, "only-after"),
      (3L, 5L, 105L, "x")
    ).toDF("user", "t", "seq", "payload")
    val out = AsOf.snapshotAt(log, Seq("user"), "t", lit(25L),
        tieBreak = "seq", payloadCols = Seq("payload"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // user 1: t=20 wins over t=10; seq 102 wins the t=20 tie; t=30 is past T
    // user 2: nothing at or before T -> absent; user 3: its only row
    assert(out.toSeq == Seq((1L, 20L, 102L, "c"), (3L, 5L, 105L, "x")))
    // one partial-aggregable max per key: HashAggregate, no Window/Sort
    val plan = AsOf.snapshotAt(log, Seq("user"), "t", lit(25L),
        tieBreak = "seq", payloadCols = Seq("payload"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Sort"), plan)
  }
}
