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

  test("canonicalized probe contract: probes exist and compare canonical surfaces (r16 verdict #1)") {
    import org.apache.spark.sql.types.StringType
    // the two former expected-red tripwires, canonicalized round 17 —
    // pin set + canonical types (a drift back to raw DECIMAL / uncast
    // HUGEINT would re-open the adjudicated driver reds)
    assert(SparkEntry.canonicalizedProbes.keySet ==
      Set("decimal_probe_dec", "hugeint_probe"))
    SparkEntry.canonicalizedProbes.keys.foreach { name =>
      assert(SparkEntry.queries.contains(name), s"$name missing from queries")
      assert(SparkEntry.oracleSql.contains(name), s"$name missing from oracleSql")
    }
    // dec probe emits the pinned scale-6 STRING rendering on both sides
    val dec = SparkEntry.queries("decimal_probe_dec")(spark, "unused")
    assert(dec.schema("dec_val").dataType == StringType)
    assert(dec.collect().map(_.getString(1)).toSeq ==
      Seq("1.250000", "-0.333333", "100.000001"))
    assert(SparkEntry.oracleSql("decimal_probe_dec").contains("AS VARCHAR"))
    // hugeint probe's oracle sums carry the canonical BIGINT cast
    assert(SparkEntry.oracleSql("hugeint_probe")
      .contains("CAST(sum(v) AS BIGINT) AS sum_v"))
  }
}
