package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Pipeline
import graft.functions.TypedAttrs
import graft.model._
import graft.operators.Binning

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def raw = Seq(
    Map("etype" -> "click", "n" -> "1"),
    Map("etype" -> "view", "n" -> "bad"),
    Map("etype" -> "click", "n" -> "3")
  ).toDF("attributes")

  private val typed: DataFrame => DataFrame =
    TypedAttrs.project(_, "attributes", TypedProjection(strings = Seq("etype"), ints = Seq("n")))

  test("pipeline composes stages with relationship routing between them") {
    val p = Pipeline(typed, Pipeline.route(Route.Success))
      .andThen(Binning.binAndCount(_, Seq(LiteralBinner("e", "etype"))))
    val out = p.run(raw).as[(String, Long)].collect().toMap
    assert(out == Map("e.click" -> 2L)) // the malformed row routed away
  }

  test("split fans a routed frame into per-relationship frames") {
    val parts = Pipeline.split(typed(raw), Seq(Route.Success, Route.Failure))
    assert(parts(Route.Success).count() == 2)
    assert(parts(Route.Failure).count() == 1)
    assert(!parts(Route.Success).columns.contains(Route.RouteCol))
  }

  test("a pipeline is a stage: pipelines nest") {
    val inner = Pipeline(typed, Pipeline.route(Route.Success))
    val outer = Pipeline(inner, (df: DataFrame) => df.select("etype"))
    assert(outer.run(raw).as[String].collect().sorted.toSeq == Seq("click", "click"))
  }
}
