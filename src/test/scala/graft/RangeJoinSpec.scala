package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic synthetic mix: short spans, zero-length spans, one
  // long outlier, negative coordinates, duplicate bounds across keys.
  private lazy val intervals = Seq(
    ("k1", 1L, 0L, 10L),
    ("k1", 2L, 10L, 10L),    // zero-length, shares bound with #1
    ("k1", 3L, -25L, -3L),   // negative coordinates
    ("k1", 4L, 5L, 500L),    // long outlier
    ("k2", 5L, 0L, 10L),     // same bounds as #1 under another key
    ("k2", 6L, 90L, 110L)
  ).toDF("k", "iid", "s", "e")

  private lazy val points = Seq(
    ("k1", 101L, 0L), ("k1", 102L, 10L), ("k1", 103L, 11L),
    ("k1", 104L, -3L), ("k1", 105L, 250L), ("k2", 106L, 10L),
    ("k2", 107L, 100L), ("k3", 108L, 5L)
  ).toDF("k", "pid", "p")

  /** The reference answer: the naive non-equi join (fine at spec scale). */
  private def naivePairs(keyed: Boolean): Set[(Long, Long)] = {
    val cond = (if (keyed) points("k") === intervals("k") else lit(true)) &&
      points("p") >= intervals("s") && points("p") <= intervals("e")
    points.join(intervals, cond)
      .select(points("pid"), intervals("iid")).as[(Long, Long)].collect().toSet
  }

  private def bucketedPairs(w: Long, keyed: Boolean,
      longCap: Option[Long] = None): Set[(Long, Long)] =
    RangeJoin.joinPointInterval(points, "p", intervals, "s", "e",
        bucketWidth = w, keys = if (keyed) Seq("k") else Seq.empty,
        broadcastLongSpans = longCap)
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet

  test("point-in-interval matches the naive range join (keyless + keyed)") {
    assert(bucketedPairs(7, keyed = false) == naivePairs(keyed = false))
    assert(bucketedPairs(7, keyed = true) == naivePairs(keyed = true))
    // Sanity on the fixture itself: inclusive bounds at both ends hit
    // (#101 at s, #102 at e and the zero-length #2), negatives work.
    assert(bucketedPairs(7, keyed = true).contains((102L, 1L)))
    assert(bucketedPairs(7, keyed = true).contains((102L, 2L)))
    assert(bucketedPairs(7, keyed = true).contains((104L, 3L)))
  }

  test("bucket width moves cost only, never the result") {
    val ref = naivePairs(keyed = true)
    for (w <- Seq(1L, 3L, 64L, 10000L))
      assert(bucketedPairs(w, keyed = true) == ref, s"width $w")
  }

  test("each qualifying pair is emitted exactly once (no bucket dedup needed)") {
    val rows = RangeJoin.joinPointInterval(points, "p", intervals, "s", "e",
        bucketWidth = 3, keys = Seq("k"))
      .select(col("pid"), col("iid")).as[(Long, Long)].collect()
    assert(rows.length == rows.toSet.size)
  }

  test("broadcast long-span tail returns identical pairs") {
    val ref = naivePairs(keyed = true)
    // cap = 4 buckets at width 7 -> interval #4 (span 496) goes broadcast
    assert(bucketedPairs(7, keyed = true, longCap = Some(4L)) == ref)
    // cap = 1 -> EVERY interval rides the broadcast path; still identical
    assert(bucketedPairs(7, keyed = true, longCap = Some(1L)) == ref)
  }

  test("null bounds, null points, and inverted intervals drop (inner semantics)") {
    val badIv = Seq(("k1", 90L, Some(5L), None: Option[Long]),
      ("k1", 91L, None: Option[Long], Some(5L)),
      ("k1", 92L, Some(9L), Some(2L))).toDF("k", "iid", "s", "e")
    val badPt = Seq(("k1", 201L, None: Option[Long]), ("k1", 202L, Some(5L)))
      .toDF("k", "pid", "p")
    val out = RangeJoin.joinPointInterval(badPt, "p", badIv, "s", "e",
      bucketWidth = 7, keys = Seq("k"))
    assert(out.count() == 0)
  }

  private def naiveOverlap(keyed: Boolean): Set[(Long, Long)] = {
    val b = intervals.select(col("k").as("bk"), col("iid").as("bid"),
      col("s").as("bs"), col("e").as("be"))
    val cond = (if (keyed) intervals("k") === b("bk") else lit(true)) &&
      intervals("s") <= b("be") && b("bs") <= intervals("e")
    intervals.join(b, cond)
      .select(col("iid"), col("bid")).as[(Long, Long)].collect().toSet
  }

  test("interval overlap matches the naive overlap join, one row per pair") {
    val b = intervals.select(col("k").as("bk"), col("iid").as("bid"),
      col("s").as("bs"), col("e").as("be"))
    for (w <- Seq(1L, 7L, 1000L)) {
      val rows = RangeJoin.joinIntervalOverlap(
          intervals, "s", "e", b, "bs", "be", bucketWidth = w,
          keys = Seq.empty)
        .filter(col("k") === col("bk"))
        .select(col("iid"), col("bid")).as[(Long, Long)].collect()
      assert(rows.length == rows.toSet.size, s"width $w emitted duplicates")
      assert(rows.toSet == naiveOverlap(keyed = true), s"width $w")
    }
  }

  test("keyed interval overlap joins within keys only") {
    val b2 = intervals.select(col("k"), col("iid").as("bid"),
      col("s").as("bs"), col("e").as("be"))
    val rows = RangeJoin.joinIntervalOverlap(
        intervals, "s", "e", b2, "bs", "be", bucketWidth = 7, keys = Seq("k"))
      .select(col("iid"), col("bid")).as[(Long, Long)].collect()
    assert(rows.length == rows.toSet.size)
    assert(rows.toSet == naiveOverlap(keyed = true))
  }

  test("bucketed plan is an equi-join: no nested-loop, no cartesian") {
    val plan = RangeJoin.joinPointInterval(points, "p", intervals, "s", "e",
        bucketWidth = 7, keys = Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
