package graft

import org.apache.spark.sql.functions._
import graft.operators.Binning
import graft.plans.GeoTile

class GeoTileExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("tileId matches the public slippy-map examples") {
    // z0 is the whole world; equator/prime-meridian at z1 is tile (1,0)... (0,1)?
    assert(GeoTile.tileId(0.0, 0.0, 0) == "0/0/0")
    assert(GeoTile.tileId(48.85, 2.35, 1) == "1/1/0")   // Paris: E, N
    assert(GeoTile.tileId(-33.86, 151.2, 1) == "1/1/1") // Sydney: E, S
    assert(GeoTile.tileId(85.1, 179.9, 3) == "3/7/0")   // clamped top-right
    assert(GeoTile.tileId(-85.1, -179.9, 3) == "3/0/7")
  }

  test("native expression equals the composed-builtin Binning.geoTileId on real data") {
    GeoTile.register(spark)
    val pts = Seq((48.85, 2.35), (-33.86, 151.2), (0.0, 0.0), (85.6, -180.0), (-90.0, 180.0))
      .toDF("lat", "lon")
    for (z <- 0 to 4) {
      val both = pts.select(
        Binning.geoTileIdComposed(col("lat"), col("lon"), z).as("builtin"),
        call_function("graft_geotile", col("lat"), col("lon"), lit(z)).as("native"))
      assert(both.filter(col("builtin") =!= col("native")).count() == 0, s"zoom $z")
    }
  }

  test("native expression participates in whole-stage codegen") {
    GeoTile.register(spark)
    // parquet-backed source: a local Seq would constant-fold to a
    // LocalTableScan with no codegen stage at all
    val q = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .limit(1)
      .select(call_function("graft_geotile",
        lit(1.0), lit(2.0), lit(2)).as("tile"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan) // codegen'd stage, no UDF fallback
    assert(q.as[String].collect()(0) == "2/2/1")
    ()
  }

  test("GraftExtensions injects the function via spark.sql.extensions") {
    val ext = new graft.plans.GraftExtensions()
    // The injection path is exercised on a fresh extensions object; the
    // shared test session covers registry + execution above.
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(exts) // must not throw; descriptor is well-formed
  }

  test("null inputs produce null tile ids") {
    GeoTile.register(spark)
    val df = Seq((Some(1.0), None: Option[Double]), (None, Some(2.0)))
      .toDF("lat", "lon")
    val out = df.select(call_function("graft_geotile", col("lat"), col("lon"), lit(1)))
      .as[Option[String]].collect()
    assert(out.forall(_.isEmpty))
  }
}
