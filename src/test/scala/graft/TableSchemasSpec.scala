package graft

import org.apache.spark.sql.functions._

class TableSchemasSpec extends SparkSpec {

  test("the driver testdata passes the guard at every scale factor") {
    for (sf <- Seq("0.001", "0.01"))
      TableSchemas.check(spark, s"/root/testdata/sf$sf")
  }

  test("deliberate dtype drift fails loudly, naming table and column") {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    // documents with n_chars as STRING (accepted: int64)
    spark.range(3)
      .select(col("id").as("doc_id"), lit("x").as("text"),
        lit("en").as("lang"), lit("src0").as("source"),
        lit("1").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalStateException] {
      TableSchemas.check(spark, dir,
        Map("documents" -> TableSchemas.expected("documents")))
    }
    assert(e.getMessage.contains("documents.n_chars"), e.getMessage)
    assert(e.getMessage.contains("SCHEMA DRIFT"), e.getMessage)
  }

  test("a missing table and a missing column are both reported in one pass") {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift2").toString
    // events without its ts column
    spark.range(3)
      .select(col("id").as("event_id"), col("id").as("user_id"),
        lit("view").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] {
      TableSchemas.check(spark, dir, Map(
        "events" -> TableSchemas.expected("events"),
        "region" -> TableSchemas.expected("region")))
    }
    assert(e.getMessage.contains("events.ts: MISSING"), e.getMessage)
    assert(e.getMessage.contains("region: MISSING"), e.getMessage)
  }
}
