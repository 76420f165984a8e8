package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.TypedAttrs
import graft.model._
import graft.operators.{Binning, Merge}
import graft.streaming.StreamingOps

/** End-to-end composition (SURVEY §5.2): attributes → typed projection →
  * binning → count agg → keyed merge state; batch and streaming variants
  * of the reference's core dataflow.
  */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  private def rawAttrs = Seq(
    Map("ts" -> "1710496800000", "etype" -> "click", "v" -> "42"),   // 2024-03-15 10:00 UTC
    Map("ts" -> "1710500400000", "etype" -> "click", "v" -> "7"),
    Map("ts" -> "1710504000000", "etype" -> "view", "v" -> "oops")   // malformed int
  ).zipWithIndex.toDF("attributes", "idx")

  test("batch: attributes -> typed -> bin -> count -> merge into state") {
    // 1. typed projection with failure routing
    val typed = TypedAttrs.project(rawAttrs, "attributes",
      TypedProjection(strings = Seq("etype"), ints = Seq("v"), epochMillisDates = Seq("ts")),
      passthrough = Seq("idx"))
    assert(typed.filter(col(Route.RouteCol) === Route.Failure).count() == 1)

    // 2. bin the success route, count per bin
    val ok = typed.filter(col(Route.RouteCol) === Route.Success)
    val counts = Binning.binAndCount(ok, Seq(
      DateBinner("time", "ts", DateGranularity.DAY),
      LiteralBinner("type", "etype")))
    val m = counts.as[(String, Long)].collect().toMap
    assert(m("type.click") == 2L && m("time.2024-03-15") == 2L)

    // 3. merge the counts into running state ($inc)
    val state = Seq(("type.click", 10L)).toDF("name", "count")
    val spec = MergeSpec(Seq("name"), Seq(MergeFieldSpec("count", MergeOp.Inc)))
    val merged = Merge.merge(state, counts, spec).state
      .as[(String, Long)].collect().toMap
    assert(merged("type.click") == 12L)   // 10 + 2
    assert(merged("time.2024-03-15") == 2L) // inserted
  }

  test("streaming: same pipeline over MemoryStream micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-e2e").toString
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "etype")
    // narrow ops compose unchanged on the stream; state via foreachBatch merge
    val binned = stream.select(
      explode(concat(
        array(concat(lit("type."), col("etype"))),
        array(concat(lit("time."), date_format(col("ts"), "yyyy-MM-dd"))))).as("name"),
      lit(1L).as("count"))
    val spec = MergeSpec(Seq("name"), Seq(MergeFieldSpec("count", MergeOp.Inc)))
    val q = StreamingOps.mergeStream(binned, spec, "count",
      s"$dir/state", s"$dir/ckpt")
    try {
      mem.addData((Timestamp.valueOf("2024-03-15 10:00:00"), "click"))
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2024-03-15 11:00:00"), "click"))
      q.processAllAvailable()
      val state = StreamingOps.readState(spark, s"$dir/state").get
        .as[(String, Long)].collect().toMap
      assert(state("type.click") == 2L)
      assert(state("time.2024-03-15") == 2L)
    } finally q.stop()
  }
}
