package graft

/** The driver smoke-checks SparkEntry.entry(spark) returns rows — pin that
  * here so a refactor can't silently break the flagship query.
  */
class EntrySmokeSpec extends SparkSpec {
  test("flagship entry query runs and returns bins with positive counts") {
    val out = SparkEntry.entry(spark)
    assert(out.columns.toSeq == Seq("name", "count"))
    val n = out.count()
    assert(n > 0)
    import org.apache.spark.sql.functions._
    assert(out.filter(col("count") <= 0).count() == 0)
  }

  test("every gate query has a DuckDB oracle (no silent rows-only drift)") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      "queries and oracleSql keys must match: " +
        (SparkEntry.queries.keySet diff SparkEntry.oracleSql.keySet) + " / " +
        (SparkEntry.oracleSql.keySet diff SparkEntry.queries.keySet))
  }

  test("expected-red probe contract: probes exist and still probe their divergence class") {
    import org.apache.spark.sql.types.DecimalType
    // the two tripwires are the ONLY expected driver reds — pin set + types
    assert(SparkEntry.expectedRedProbes.keySet ==
      Set("decimal_probe_dec", "hugeint_probe"))
    SparkEntry.expectedRedProbes.keys.foreach { name =>
      assert(SparkEntry.queries.contains(name), s"$name missing from queries")
      assert(SparkEntry.oracleSql.contains(name), s"$name missing from oracleSql")
    }
    // dec probe must emit DECIMAL on the Spark side (the divergent type)
    val dec = SparkEntry.queries("decimal_probe_dec")(spark, "unused")
    assert(dec.schema("dec_val").dataType.isInstanceOf[DecimalType])
    // hugeint probe's oracle must keep sum(v) UNCAST (DuckDB HUGEINT)
    assert(SparkEntry.oracleSql("hugeint_probe").contains("sum(v) AS sum_v"))
  }
}
