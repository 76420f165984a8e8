package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("numeric profile: counts, nulls, range, exact mean and quartiles") {
    val df = Seq[(java.lang.Double, java.lang.Long)](
      (1.0, 10L), (2.0, 20L), (3.0, null), (4.0, 40L), (null, 50L)
    ).toDF("x", "y")
    val p = Profile.numeric(df, Seq("x", "y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = p("x")
    assert(x.getLong(1) == 4 && x.getLong(2) == 1)      // n, nulls
    assert(x.getDouble(3) == 1.0 && x.getDouble(4) == 4.0)
    assert(x.getDouble(5) == 2.5)                        // mean over non-null
    assert(x.getDouble(7) == 2.5)                        // p50 of 1,2,3,4
    val y = p("y")
    assert(y.getLong(1) == 4 && y.getLong(2) == 1)
    assert(y.getDouble(5) == 30.0)
    // all-null column profiles to null stats, not a crash
    val z = Profile.numeric(df.withColumn("z", lit(null).cast("double")), Seq("z"))
      .collect().head
    assert(z.getLong(1) == 0 && z.isNullAt(5))
  }
}
