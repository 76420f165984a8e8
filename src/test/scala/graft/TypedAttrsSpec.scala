package graft

import org.apache.spark.sql.functions._
import graft.functions.TypedAttrs
import graft.model.{Route, TypedProjection}

/** BetterAttributesToJSON semantics (SURVEY §2 rows 6-12, §7.5 #1/#2). */
class TypedAttrsSpec extends SparkSpec {
  import spark.implicits._

  private def attrsDf(maps: Map[String, String]*) =
    maps.zipWithIndex.toDF("attributes", "idx")

  test("null-default asymmetry: string->'' boolean->false int/double->null") {
    val df = attrsDf(Map("s" -> "x", "b" -> "true", "i" -> "7", "d" -> "1.5"), Map.empty)
    val out = TypedAttrs.project(df, "attributes",
      TypedProjection(strings = Seq("s"), booleans = Seq("b"), ints = Seq("i"), doubles = Seq("d")),
      passthrough = Seq("idx"))
    val got = out.orderBy("idx").select("s", "b", "i", "d").collect()
    assert(got(0).toSeq == Seq("x", true, 7, 1.5))
    assert(got(1).toSeq == Seq("", false, null, null))
  }

  test("Boolean.parseBoolean semantics: only 'true' (case-insensitive) is true") {
    val df = attrsDf(Map("b" -> "TRUE"), Map("b" -> "yes"), Map("b" -> "1"))
    val out = TypedAttrs.project(df, "attributes", TypedProjection(booleans = Seq("b")), Seq("idx"))
    assert(out.orderBy("idx").select("b").as[Boolean].collect().toSeq == Seq(true, false, false))
  }

  test("malformed numeric attribute routes to failure; missing does not") {
    val df = attrsDf(Map("i" -> "12"), Map("i" -> "garbage"), Map.empty)
    val out = TypedAttrs.project(df, "attributes", TypedProjection(ints = Seq("i")), Seq("idx"))
    assert(out.orderBy("idx").select(Route.RouteCol).as[String].collect().toSeq ==
      Seq(Route.Success, Route.Failure, Route.Success))
  }

  test("array-sum folds: double and int lists honored independently (bug #2 not replicated)") {
    val df = attrsDf(Map("ds" -> "[1.5,2.5]", "is" -> "[1,2,3]"))
    val out = df.select(
      TypedAttrs.doubleArraySum(element_at($"attributes", "ds")).as("d"),
      TypedAttrs.intArraySum(element_at($"attributes", "is")).as("i"))
    assert(out.collect()(0).toSeq == Seq(4.0, 6L))
  }

  test("epoch millis -> ISO-8601 GMT-0 $date string") {
    val df = Seq("1455494400000").toDF("e") // 2016-02-15T00:00:00.000Z
    val out = df.select(TypedAttrs.isoMillis(TypedAttrs.epochMillisAttr($"e")).as("iso"))
    assert(out.as[String].collect()(0) == "2016-02-15T00:00:00.000Z")
  }

  test("empty config: whole attribute map passes through (select-all fallback)") {
    val df = attrsDf(Map("a" -> "1", "b" -> "2"))
    val out = TypedAttrs.project(df, "attributes", TypedProjection())
    assert(out.select("attributes").as[Map[String, String]].collect()(0) ==
      Map("a" -> "1", "b" -> "2"))
  }
}
