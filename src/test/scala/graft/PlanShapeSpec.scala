package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model._
import graft.operators.Binning

/** Plan-shape assertions: the properties that make these operators hold at
  * 100 TB — pushdown reaching the scan, column pruning, broadcast of small
  * sides, narrow fan-out, partial aggregation — checked on the actual
  * optimized/physical plans against the driver's parquet tables.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  private def physical(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("filter + projection push into the parquet scan") {
    val q = t("lineitem")
      .filter(col("l_quantity") > 30.0)
      .select("l_orderkey", "l_quantity")
    val plan = physical(q)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)"), plan)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), plan)
  }

  test("small dimension side of a join is broadcast, not shuffled") {
    val c = t("customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t("orders")
    val q = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
    assert(physical(q).contains("BroadcastHashJoin"), physical(q))
  }

  test("bin fan-out is narrow: no Exchange below the count aggregate's shuffle") {
    val ev = t("events").select(
      timestamp_micros(expr("ts div 1000")).as("ts"),
      col("event_type"))
    val q = Binning.binAndCount(ev, Seq(
      DateBinner("t", "ts", DateGranularity.DAY),
      LiteralBinner("e", "event_type")))
    val plan = physical(q)
    // exactly one exchange: the aggregate's (partial agg happens before it)
    assert(plan.split("Exchange ").length - 1 == 1, plan)
    assert(plan.contains("partial_sum") || plan.contains("partial_count") ||
      plan.split("HashAggregate").length - 1 >= 2, plan)
  }

  test("count aggregate uses two-phase hash aggregation (map-side combine)") {
    val ev = t("events").select(col("event_type"))
    val q = Binning.binAndCount(ev, Seq(LiteralBinner("e", "event_type")))
    val plan = physical(q)
    assert(plan.split("HashAggregate").length - 1 >= 2, plan) // partial + final
  }

  test("typed projection stays inside whole-stage codegen (no UDFs)") {
    import graft.functions.TypedAttrs
    val df = t("customer").select(
      map(lit("k"), col("c_custkey").cast("string")).as("attributes"))
    val q = TypedAttrs.project(df, "attributes", TypedProjection(ints = Seq("k")))
    val plan = physical(q)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    // whole-stage-codegen'd operators render with a "*(n)" stage prefix
    assert(plan.contains("*(1)"), plan)
  }
}
