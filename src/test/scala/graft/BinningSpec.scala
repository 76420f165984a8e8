package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.model._
import graft.operators.Binning

/** DataBinningProcessor semantics (SURVEY §2.3, §7.5 #11). */
class BinningSpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-03-15 10:30:00")
  private def events = Seq(
    (1L, ts, "click", 42.0, 48.85, 2.35),   // Paris-ish
    (2L, ts, "view", 420.0, 48.85, 2.35),
    (3L, Timestamp.valueOf("2024-04-01 00:00:00"), "click", 7.0, -33.86, 151.2) // Sydney-ish
  ).toDF("id", "ts", "etype", "value", "lat", "lon")

  test("date binner emits one name per hierarchy level YEAR..granularity") {
    val out = Binning.binAndCount(events, Seq(DateBinner("t", "ts", DateGranularity.DAY)))
    val m = out.as[(String, Long)].collect().toMap
    assert(m("t.2024") == 3L)
    assert(m("t.2024-03") == 2L)
    assert(m("t.2024-03-15") == 2L)
    assert(m("t.2024-04-01") == 1L)
    assert(m.keys.count(_.startsWith("t.")) == 5) // 2024, 2024-03, 2024-03-15, 2024-04, 2024-04-01
  }

  test("literal binner: one bin per value") {
    val out = Binning.binAndCount(events, Seq(LiteralBinner("e", "etype")))
    assert(out.as[(String, Long)].collect().toMap == Map("e.click" -> 2L, "e.view" -> 1L))
  }

  test("numeric binner: hierarchical powers of 10") {
    val out = Binning.binAndCount(events, Seq(NumericBinner("v", "value", 2)))
    val m = out.as[(String, Long)].collect().toMap
    assert(m("v.L0.42") == 1L)
    assert(m("v.L1.40") == 1L)
    assert(m("v.L2.0") == 2L)   // 42 and 7
    assert(m("v.L2.400") == 1L) // 420
  }

  test("geotile binner: slippy tile ids, zoom 0..maxLevel") {
    val out = Binning.binAndCount(events, Seq(GeoTileBinner("g", "lat", "lon", 2)))
    val m = out.as[(String, Long)].collect().toMap
    assert(m("g.0/0/0") == 3L)          // everything is in the one z0 tile
    assert(m("g.1/1/0") == 2L)          // Paris: x=1,y=0 at z1 (lon>0, lat>0)
    assert(m("g.1/1/1") == 1L)          // Sydney: southern hemisphere
    // zoom 2: Paris lon 2.35 -> x=2, lat 48.85 -> y=1
    assert(m("g.2/2/1") == 2L)
  }

  test("merged binner: cross product of constituent names") {
    val out = Binning.binAndCount(events, Seq(
      DateBinner("t", "ts", DateGranularity.YEAR),
      LiteralBinner("e", "etype"),
      MergedBinner("m", Seq("t", "e"))))
    val m = out.as[(String, Long)].collect().toMap
    assert(m("m.t.2024|e.click") == 2L)
    assert(m("m.t.2024|e.view") == 1L)
  }

  test("native CrossConcat merged binner equals the composed HOF form") {
    // three constituents (incl. a multi-element date hierarchy and an
    // empty array from a null field) — element-order and empty semantics
    // must match the interpreted flatten/transform reduce exactly
    val df = Seq(
      (Some("click"), Some(ts), 42.0),
      (None, Some(ts), 7.0),          // null literal -> empty constituent
      (Some("view"), None, 420.0)     // null ts -> empty constituent
    ).toDF("etype", "ts", "value")
    val parts = Seq(
      Binning.dateBinNames("t", col("ts"), DateGranularity.DAY),
      Binning.literalBinNames("e", col("etype")),
      Binning.numericBinNames("v", col("value"), 1))
    val native = df.select(Binning.mergedBinNames("m", parts).as("a"))
      .as[Seq[String]].collect().toSeq
    val composed = df.select(Binning.mergedBinNamesComposed("m", parts).as("a"))
      .as[Seq[String]].collect().toSeq
    assert(native == composed)
    assert(native.head.nonEmpty && native(1).isEmpty && native(2).isEmpty)
  }

  test("date binner prefix-substring form equals per-level date_format") {
    val g = DateGranularity.MIN
    val perLevel = array(
      Seq("yyyy", "yyyy-MM", "yyyy-MM-dd", "yyyy-MM-dd-HH", "yyyy-MM-dd-HH-mm")
        .map(f => concat(lit("t."), date_format(col("ts"), f))): _*)
    val got = events.select(Binning.dateBinNames("t", col("ts"), g).as("a"))
      .as[Seq[String]].collect().toSeq
    val want = events.select(perLevel.as("a")).as[Seq[String]].collect().toSeq
    assert(got == want)
  }

  test("merged binner forward reference fails at config compile") {
    val e = intercept[IllegalArgumentException] {
      Binning.fanOut(events, Seq(MergedBinner("m", Seq("nope")), LiteralBinner("nope", "etype")))
    }
    assert(e.getMessage.contains("undefined/forward"))
  }

  test("null field values produce no bins") {
    val df = Seq((Some("a"), 1), (None, 2)).toDF("v", "i")
    val out = Binning.binAndCount(df, Seq(LiteralBinner("b", "v")))
    assert(out.as[(String, Long)].collect().toMap == Map("b.a" -> 1L))
  }

  test("count invariant: sum of literal-bin counts equals non-null rows") {
    val out = Binning.binAndCount(events, Seq(LiteralBinner("e", "etype")))
    assert(out.agg(sum("count")).as[Long].collect()(0) == 3L)
  }

  test("binsPerRecord: bounded per-record array, multiple-output mode") {
    val out = Binning.binsPerRecord(events, Seq(
      DateBinner("t", "ts", DateGranularity.YEAR),
      LiteralBinner("e", "etype")), "id")
    val first = out.orderBy("id").select("bins").collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(first.map(_.getString(0)) == Seq("t.2024", "e.click"))
    assert(first.forall(_.getLong(1) == 1L))
  }
}
