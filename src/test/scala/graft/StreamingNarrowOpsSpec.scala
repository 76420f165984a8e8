package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.TypedAttrs
import graft.model._
import graft.operators.{Binning, SecurityMarking}

/** The reference's per-record operators are stateless in our engine, so
  * they must compose UNCHANGED on streaming DataFrames (SURVEY §1.3:
  * "the natural Spark analogue for the pipeline as a whole is Structured
  * Streaming ... with plain batch DataFrame equivalents"). Pin that: the
  * same operator code runs on a MemoryStream micro-batch.
  */
class StreamingNarrowOpsSpec extends SparkSpec {
  import spark.implicits._

  test("typed projection + security marking + bin fan-out run on a stream unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, String)]
    val stream = mem.toDF().toDF("etype", "num", "marking")
      .select(map(lit("etype"), $"etype", lit("num"), $"num").as("attributes"), $"marking")

    val cfg = SecurityConfig(
      levelsToConvertTo = Seq("ALPHA"), levelsCanReceive = Seq("ALPHA"),
      abbreviatedLevelsCanReceive = Seq("A"), compartments = Seq("CMP"),
      disseminationControls = Seq("DCA", "DCB"), releasabilities = Seq("XX"))

    // identical operator calls as batch — no streaming-specific variants
    val typed = TypedAttrs.project(stream, "attributes",
      TypedProjection(strings = Seq("etype"), ints = Seq("num")),
      passthrough = Seq("marking"))
    val enriched = typed.withColumn("cls",
      SecurityMarking.classification($"marking", cfg))
    val (staged, binCols) = Binning.withBinArrays(enriched, Seq(LiteralBinner("e", "etype")))
    val out = staged.select(
      $"etype", $"num", $"cls.levels".getItem(0).as("level"),
      explode(concat(binCols.map(col): _*)).as("bin"))

    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("narrow_ops").start()
    try {
      mem.addData(("click", "7", "A_CMP_XX"), ("view", "x", "ALPHA_XX"))
      q.processAllAvailable()
      val got = spark.table("narrow_ops")
        .select("etype", "num", "level", "bin")
        .collect().map(_.toSeq).toSet
      assert(got == Set(
        Seq("click", 7, "ALPHA", "e.click"),
        Seq("view", null, "ALPHA", "e.view")))
    } finally q.stop()
  }

  test("classification serializes to the reference's JSON document shape") {
    val cfg = SecurityConfig(
      levelsToConvertTo = Seq("ALPHA"), levelsCanReceive = Seq("ALPHA"),
      abbreviatedLevelsCanReceive = Seq("A"), compartments = Seq("CMP"),
      disseminationControls = Seq("DCA", "DCB"), releasabilities = Seq("XX"))
    val json = Seq("A_CMP_XX").toDF("m")
      .select(to_json(SecurityMarking.classification($"m", cfg)).as("j"))
      .as[String].collect()(0)
    assert(json ==
      """{"levels":["ALPHA"],"compartments":["CMP"],"releasabilities":["XX"],"disseminationControls":["DCB"]}""")
  }

  test("splitByHash assigns identical labels on a stream (no shuffle, no state)") {
    import graft.operators.Sampling
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val out = Sampling.splitByHash(mem.toDF().toDF("id"), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("stream_split").start()
    try {
      mem.addData(1L to 200L: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_split")
        .select("id", "split").as[(Long, String)].collect().toMap
      val batch = Sampling.splitByHash((1L to 200L).toDF("id"), "id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("id", "split").as[(Long, String)].collect().toMap
      assert(streamed == batch)
    } finally q.stop()
  }
}
