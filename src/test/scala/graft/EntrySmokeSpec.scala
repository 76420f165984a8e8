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
}
