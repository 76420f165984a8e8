package graft

import org.apache.spark.sql.functions._
import graft.functions.LayoutFunctions

class LayoutFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey: bit interleave matches a reference implementation; locality ordering holds") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val pts = for (x <- 0L to 8L; y <- 0L to 8L) yield (x, y)
    val d = pts.toDF("x", "y")
    val got = d.select($"x", $"y",
        LayoutFunctions.zorderKey($"x", $"y", bits = 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == ref(x, y, 8), s"($x,$y)") }
    // canonical Morton values: (1,0)→1, (0,1)→2, (1,1)→3, (2,2)→12
    val m = got.map { case (x, y, z) => (x, y) -> z }.toMap
    assert(m((1L, 0L)) == 1L && m((0L, 1L)) == 2L && m((1L, 1L)) == 3L && m((2L, 2L)) == 12L)
    // truncation: bits above `bits` are ignored
    val t = Seq((256L, 0L)).toDF("x", "y")
      .select(LayoutFunctions.zorderKey($"x", $"y", 8)).as[Long].head()
    assert(t == 0L)
    // the key stays narrow: no Exchange in the plan
    val plan = d.select(LayoutFunctions.zorderKey($"x", $"y", 16))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    intercept[IllegalArgumentException] { LayoutFunctions.zorderKey($"x", $"y", 0) }
    intercept[IllegalArgumentException] { LayoutFunctions.zorderKey($"x", $"y", 32) }
  }

  test("zorderKey3: stride-3 interleave matches a reference; truncation; bounds") {
    def ref(x: Long, y: Long, z: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (3 * i)) | (((y >> i) & 1L) << (3 * i + 1)) |
        (((z >> i) & 1L) << (3 * i + 2))).sum
    val pts = for (x <- 0L to 5L; y <- 0L to 5L; z <- 0L to 5L) yield (x, y, z)
    val got = pts.toDF("x", "y", "z")
      .select($"x", $"y", $"z",
        LayoutFunctions.zorderKey3($"x", $"y", $"z", 6).as("k"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (x, y, z, k) => assert(k == ref(x, y, z, 6), s"($x,$y,$z)") }
    // canonical: (1,0,0)→1, (0,1,0)→2, (0,0,1)→4, (1,1,1)→7
    val m = got.map(g => (g._1, g._2, g._3) -> g._4).toMap
    assert(m((1L, 0L, 0L)) == 1L && m((0L, 1L, 0L)) == 2L &&
      m((0L, 0L, 1L)) == 4L && m((1L, 1L, 1L)) == 7L)
    intercept[IllegalArgumentException] { LayoutFunctions.zorderKey3($"x", $"y", $"z", 0) }
    intercept[IllegalArgumentException] { LayoutFunctions.zorderKey3($"x", $"y", $"z", 21) }
  }

  test("hilbertKey: bijective, unit-step adjacent, truncating, narrow") {
    val p = 4
    val n = 1L << p // 16×16 grid
    val pts = for (x <- 0L until n; y <- 0L until n) yield (x, y)
    val got = pts.toDF("x", "y")
      .select($"x", $"y", LayoutFunctions.hilbertKey($"x", $"y", p).as("h"))
      .as[(Long, Long, Long)].collect()
    // bijective over the full grid: every d in [0, 4^p) exactly once
    assert(got.map(_._3).sorted.toSeq == (0L until n * n).toSeq)
    // THE Hilbert property: consecutive keys are grid neighbors
    val byD = got.map(g => g._3 -> ((g._1, g._2))).toMap
    (1L until n * n).foreach { d =>
      val (x1, y1) = byD(d - 1); val (x2, y2) = byD(d)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L, s"jump at d=$d")
    }
    // matches the driver-side loop reference on out-of-grid inputs too
    // (truncation to low `order` bits)
    val refExpr = graft.plans.HilbertKey(
      org.apache.spark.sql.catalyst.expressions.Literal(0L),
      org.apache.spark.sql.catalyst.expressions.Literal(0L), p)
    val big = Seq((n + 3L, 2L * n + 5L)).toDF("x", "y")
      .select(LayoutFunctions.hilbertKey($"x", $"y", p)).as[Long].head()
    assert(big == refExpr.compute(3L, 5L), big.toString)
    // narrow: no Exchange
    val plan = pts.toDF("x", "y")
      .select(LayoutFunctions.hilbertKey($"x", $"y", 31))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    intercept[IllegalArgumentException] { LayoutFunctions.hilbertKey($"x", $"y", 0) }
    intercept[IllegalArgumentException] { LayoutFunctions.hilbertKey($"x", $"y", 32) }
  }

  test("clustered write layout: repartitionByRange on the curve key yields disjoint per-file ranges") {
    // the write-side contract both curve keys exist FOR: files of a
    // range-partitioned, within-sorted layout carry non-overlapping
    // key ranges, so min/max file stats prune every key predicate
    val df = spark.range(20000).select(
      (col("id") * 2654435761L % 1000).as("x"),
      (col("id") * 40503L % 1000).as("y"))
    val keyed = df.select(
      LayoutFunctions.hilbertKey(col("x"), col("y"), 10).as("h"))
    val ranges = keyed.repartitionByRange(8, col("h"))
      .sortWithinPartitions("h")
      .select(spark_partition_id().as("p"), col("h"))
      .groupBy("p").agg(min("h").as("lo"), max("h").as("hi"))
      .orderBy("lo")
      .as[(Int, Long, Long)].collect()
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2, s"overlap: $a vs $b")
      case _ =>
    }
  }
}
