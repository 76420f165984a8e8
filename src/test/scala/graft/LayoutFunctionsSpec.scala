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
}
