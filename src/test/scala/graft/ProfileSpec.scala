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
    assert(x.getLong(3) == 4)                            // n_distinct (free from the histogram)
    assert(x.getDouble(4) == 1.0 && x.getDouble(5) == 4.0)
    assert(x.getDouble(6) == 2.5)                        // mean over non-null
    assert(x.getDouble(8) == 2.5)                        // p50 of 1,2,3,4
    val y = p("y")
    assert(y.getLong(1) == 4 && y.getLong(2) == 1)
    assert(y.getLong(3) == 4)
    assert(y.getDouble(6) == 30.0)
    // duplicated values: n counts rows, n_distinct counts values
    val d = Profile.numeric(
        Seq(1.0, 1.0, 2.0).toDF("w"), Seq("w")).collect().head
    assert(d.getLong(1) == 3 && d.getLong(3) == 2)
    // all-null column profiles to null stats, not a crash
    val z = Profile.numeric(df.withColumn("z", lit(null).cast("double")), Seq("z"))
      .collect().head
    assert(z.getLong(1) == 0 && z.getLong(3) == 0 && z.isNullAt(6))
  }

  test("approx profile: exact counts/range/mean, percentiles within sketch bounds, partial-aggregable plan") {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val exact = Profile.numeric(li, cols)
      .collect().map(r => r.getString(0) -> r).toMap
    val q = Profile.numericApprox(li, cols, accuracy = 10000)
    val approx = q.collect().map(r => r.getString(0) -> r).toMap
    for (c <- cols) {
      val (e, a) = (exact(c), approx(c))
      // everything but the percentiles is EXACT (same decimal mean);
      // exact layout has n_distinct at idx 3, approx layout does not
      assert(a.getLong(1) == e.getLong(1) && a.getLong(2) == e.getLong(2))
      assert(a.getDouble(3) == e.getDouble(4) && a.getDouble(4) == e.getDouble(5))
      assert(a.getDouble(5) == e.getDouble(6), s"$c mean")
      // percentiles: GK rank error n/accuracy ⇒ tiny value drift; bound
      // it at 5% of the column range (loose, deterministic)
      val range = e.getDouble(5) - e.getDouble(4)
      for (i <- 6 to 9)
        assert(math.abs(a.getDouble(i) - e.getDouble(i + 1)) <= range * 0.05,
          s"$c pct idx $i: approx ${a.getDouble(i)} vs exact ${e.getDouble(i + 1)}")
    }
    // the scale property: ONE two-phase hash/object aggregate — partial
    // sketches map-side, no value-histogram shuffle, no per-column
    // repartition stage (the exact form's scale ceiling)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.split("ObjectHashAggregate|SortAggregate|HashAggregate").length - 1 >= 2, plan)
    // the exact percentile aggregate is absent (negative lookbehind:
    // "approx_percentile(v" must not count as a match)
    assert(!java.util.regex.Pattern.compile("(?<!approx_)percentile\\(v")
      .matcher(plan).find(), plan)
  }

  test("vector profile: per-dimension moments, zero-variance dims guard, partial-agg plan") {
    val df = Seq(
      Tuple1(Array(1.0f, 0.0f, 5.0f)),
      Tuple1(Array(3.0f, 0.0f, -5.0f)),
      Tuple1(Array(5.0f, 0.0f, 0.0f))
    ).toDF("v")
    val got = Profile.vector(df, "v")
      .select("dim", "n", "min", "max", "mean", "std")
      .as[(Int, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0) == ((0, 3L, 1.0, 5.0, 3.0, math.sqrt(35.0 / 3.0 - 9.0))))
    // dead dimension: exactly zero variance, no NaN from the E[x²]−mean²
    // cancellation (decimal sums make it exactly 0 here)
    assert(got(1) == ((1, 3L, 0.0, 0.0, 0.0, 0.0)))
    assert(got(2)._5 == 0.0 && math.abs(got(2)._6 - math.sqrt(50.0 / 3.0)) < 1e-12)
    // one two-phase aggregate over the exploded pairs: partial combine
    // map-side, no repartition, no second shuffle
    val plan = Profile.vector(df, "v").queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.split("Exchange").length - 1 == 1, plan)
  }

  test("distributed selection: bit-identical to the engine percentile aggregate, under forced narrowing") {
    // exact percentiles now come from bucketed selection over the value
    // histogram (no stage ∝ |distinct values|); the contract is
    // BIT-FOR-BIT equality with Spark's percentile aggregate — same
    // order statistics, same interpolation arithmetic. Tiny buckets +
    // directThreshold force the bucket walk and the recursive narrow
    // even on small data, covering every code path.
    val probs = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    def reference(df: org.apache.spark.sql.DataFrame, c: String): Seq[Double] =
      df.select(col(c).cast("double").as("v")).filter(col("v").isNotNull)
        .agg(expr(s"percentile(v, array(${probs.mkString(", ")}))"))
        .collect()(0).getSeq[Double](0)
    val datasets = Seq(
      // dups + interpolation between distinct values
      (1 to 100).map(i => (i % 17).toDouble) ++ Seq(3.0, 3.0, 3.0),
      // huge-outlier skew: 99% of distinct values land in bucket 0 of
      // the first level -> nested re-bucketing must engage
      (1 to 500).map(_.toDouble / 1000.0) :+ 1e12,
      // negatives + irregular gaps
      Seq(-5.5, -2.25, 0.0, 0.125, 7.75, 1000.0, -999.0),
      // single distinct value (width 0 -> direct sort path)
      Seq.fill(10)(42.0),
      // two values straddling every prob
      Seq(1.0, 2.0))
    for ((data, i) <- datasets.zipWithIndex) {
      val df = data.toDF("x")
      val got = Profile.exactPercentilesImpl(df, "x", probs,
        buckets = 4, directThreshold = 2L)
      assert(got.isDefined, s"dataset $i")
      val want = reference(df, "x")
      assert(got.get == want, s"dataset $i: ${got.get} vs $want")
      // and the default knobs agree too
      assert(Profile.exactPercentiles(df, "x", probs).get == want, s"dataset $i defaults")
    }
    // all-null and empty inputs profile to None, not a crash
    assert(Profile.exactPercentiles(
      Seq[Option[Double]](None, None).toDF("x"), "x", probs).isEmpty)
    assert(Profile.exactPercentiles(
      Seq.empty[Double].toDF("x"), "x", probs).isEmpty)
    // numeric() rides the same machinery: percentile columns match the
    // engine reference on a real table
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val prof = Profile.numeric(li, Seq("l_extendedprice", "l_quantity"))
      .collect().map(r => r.getString(0) -> r).toMap
    val wantLi = li.select(expr(
      "percentile(cast(l_extendedprice as double), array(0.25, 0.5, 0.75, 0.9))"))
      .collect()(0).getSeq[Double](0)
    val e = prof("l_extendedprice")
    assert(Seq(e.getDouble(7), e.getDouble(8), e.getDouble(9), e.getDouble(10)) == wantLi)
  }

  test("approx-bounds variants: sketch bounds track exact, no value histogram in the plan") {
    // the scale path for continuous columns: exact percentile's final
    // merge is ∝ |distinct values|; the sketch holds ≤ accuracy samples
    val df = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    // with accuracy ≥ n the sketch is rank-exact but returns an
    // OBSERVED value (no interpolation): bounds land on a value
    // adjacent to the exact interpolated one
    val exactW = Profile.winsorize(df, "x", 0.10, 0.90)
      .as[(Long, Double)].collect().toMap
    val approxW = Profile.winsorize(df, "x", 0.10, 0.90, approxBounds = true)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(approxW(1L) - exactW(1L)) <= 1.0)     // low clip
    assert(math.abs(approxW(1000L) - exactW(1000L)) <= 1.0) // high clip
    assert(approxW(500L) == 500.0)                        // interior untouched
    val exactR = Profile.robustScale(df, "x").as[(Long, Double, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    val approxR = Profile.robustScale(df, "x", approxBounds = true)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> r._3).toMap
    // median/iqr shift by < one value step on this data -> scaled values agree closely
    assert(math.abs(approxR(500L) - exactR(500L)) < 0.01)
    // quantile buckets: every row within one bucket of the exact assignment
    val exactQ = Profile.quantileBuckets(df, "x", 4)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._3).toMap
    val approxQ = Profile.quantileBuckets(df, "x", 4, approxBounds = true)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(exactQ.keySet == approxQ.keySet)
    assert(exactQ.forall { case (id, b) => math.abs(approxQ(id) - b) <= 1 })
    // outlier flags: same flag set here (bounds sit far from any data boundary)
    val planted = df.union(Seq((9999L, 1e6)).toDF("id", "x"))
    val exactO = Profile.outlierFlags(planted, "x")
      .select("id", "z_outlier", "iqr_outlier")
      .as[(Long, Boolean, Boolean)].collect().toSet
    val approxO = Profile.outlierFlags(planted, "x", approxBounds = true)
      .select("id", "z_outlier", "iqr_outlier")
      .as[(Long, Boolean, Boolean)].collect().toSet
    assert(exactO == approxO)
    // plan shape: the sketch path is a grand aggregate over raw rows —
    // no distinct-value groupBy anywhere, no exact percentile aggregate
    val plan = Profile.approxPercentileAgg(df, "x", Seq(0.25, 0.5), 10000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("approx_percentile"), plan)
    assert(!plan.contains("keys=[v"), plan)
    assert(!java.util.regex.Pattern.compile("(?<!approx_)percentile\\(v")
      .matcher(plan).find(), plan)
  }

  test("vector profile: null elements excluded from n, counted in nulls, mean undeflated") {
    // sum/min/max skip nulls, so n must too — otherwise a null element
    // deflates mean and std silently (the numeric() convention)
    val df = Seq(
      Tuple1(Array[java.lang.Float](1.0f, 2.0f)),
      Tuple1(Array[java.lang.Float](3.0f, null)),
      Tuple1(Array[java.lang.Float](5.0f, 4.0f))
    ).toDF("v")
    val got = Profile.vector(df, "v")
      .select("dim", "n", "nulls", "mean", "std")
      .as[(Int, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0) == ((0, 3L, 0L, 3.0, math.sqrt(35.0 / 3.0 - 9.0))))
    assert(got(1)._2 == 2L && got(1)._3 == 1L)
    assert(got(1)._4 == 3.0, s"mean over the 2 non-null values: ${got(1)}")
  }

  test("winsorize: clips at exact percentile bounds, nulls untouched, clip is narrow") {
    val df = ((1 to 100).map(i => (i.toLong, Some(i.toDouble))) :+
      (101L, None: Option[Double])).toDF("id", "x")
    val out = Profile.winsorize(df, "x", 0.10, 0.90)
      .as[(Long, Option[Double])].collect().toMap
    // exact percentile of 1..100 at .10/.90 ≈ 10.9 / 90.1 (linear interp)
    def near(a: Option[Double], b: Double) = a.exists(v => math.abs(v - b) < 1e-9)
    assert(near(out(1L), 10.9) && near(out(5L), 10.9))
    assert(near(out(100L), 90.1) && near(out(95L), 90.1))
    assert(out(50L).contains(50.0)) // interior untouched
    assert(out(101L).isEmpty)       // null passes through
    // the clip phase itself is narrow (bounds were collected up front)
    val plan = Profile.winsorize(df, "x", 0.10, 0.90)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }

  test("bandFilter: keeps exactly the in-band rows, drops nulls, filter is narrow") {
    val df = ((1 to 100).map(i => (i.toLong, Some(i.toDouble))) :+
      (101L, None: Option[Double])).toDF("id", "x")
    val kept = Profile.bandFilter(df, "x", 0.10, 0.90)
      .select("id").as[Long].collect().toSet
    // bounds 10.9 / 90.1 (same interpolation as winsorize) → ids 11..90
    assert(kept == (11L to 90L).toSet)
    // null row dropped (no value, no band membership); empty input → empty
    assert(!kept.contains(101L))
    assert(Profile.bandFilter(df.filter(lit(false)), "x").count() == 0)
    // integer columns refused — an interpolated bound isn't an int
    intercept[IllegalArgumentException] {
      Profile.bandFilter(df.select(col("id").as("x")), "x")
    }
    val plan = Profile.bandFilter(df, "x", 0.10, 0.90)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }

  test("standardizeVectors: z-scores, dead dims to 0, narrow literal-array transform") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(3.0f, 0.0f)),
      (3L, Array(5.0f, 0.0f))
    ).toDF("id", "v")
    val prof = Profile.vector(df, "v")
    val out = Profile.standardizeVectors(df, "v", prof)
      .select("id", "v").as[(Long, Seq[Double])].collect().toMap
    val std0 = math.sqrt(35.0 / 3.0 - 9.0)
    assert(math.abs(out(1L)(0) - (1.0 - 3.0) / std0) < 1e-12)
    assert(math.abs(out(3L)(0) - (5.0 - 3.0) / std0) < 1e-12)
    // dead dimension: 0, never NaN
    assert(out.values.forall(v => v(1) == 0.0 && !v.exists(_.isNaN)))
    // a NULL vector passes through as null (absent, not malformed);
    // a wrong-LENGTH vector fails loudly
    val withNull = Seq((10L, null: Array[Float]), (11L, Array(1.0f, 2.0f)))
      .toDF("id", "v")
    val nn = Profile.standardizeVectors(withNull, "v", prof)
      .select("id", "v").as[(Long, Option[Seq[Double]])].collect().toMap
    assert(nn(10L).isEmpty && nn(11L).isDefined)
    val bad = Seq((12L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    val e = intercept[Exception] {
      Profile.standardizeVectors(bad, "v", prof).collect()
    }
    assert(e.getMessage.contains("profile dimensionality"), e.getMessage)
    // the transform is narrow — the profile rides as literals, no join
    val plan = Profile.standardizeVectors(df, "v", prof)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }

  test("quantileBuckets: quartile assignment on a hand computable column") {
    // values 1..8, q=4 -> bounds at p=.25/.5/.75 = 2.75, 4.5, 6.25
    val df = (1 to 8).map(_.toDouble).toDF("x")
    val out = Profile.quantileBuckets(df, "x", q = 4)
      .select("x", "bucket").as[(Double, Long)].collect().toMap
    assert(out == Map(1.0 -> 0L, 2.0 -> 0L, 3.0 -> 1L, 4.0 -> 1L,
      5.0 -> 2L, 6.0 -> 2L, 7.0 -> 3L, 8.0 -> 3L))
    // nulls bucket to null; constant column occupies exactly one bucket
    val withNull = Seq(Some(1.0), None, Some(2.0)).toDF("x")
    val nb = Profile.quantileBuckets(withNull, "x", q = 2)
      .select("bucket").as[Option[Long]].collect()
    assert(nb.count(_.isEmpty) == 1)
    val const = Seq.fill(5)(7.0).toDF("x")
    val cb = Profile.quantileBuckets(const, "x", q = 10)
      .select("bucket").as[Long].collect().toSet
    assert(cb.size == 1)
    // the assignment is narrow: bounds are literals, no join, no shuffle
    val plan = Profile.quantileBuckets(df, "x", q = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }

  test("percentRank: ECDF with min-rank ties; nulls and single-value safe") {
    val df = Seq(10.0, 20.0, 20.0, 40.0).toDF("x")
    val out = Profile.percentRank(df, "x")
      .select("x", "pct_rank").as[(Double, Double)].collect()
    val byVal = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byVal(10.0) == Set(0.0))
    assert(byVal(20.0) == Set(1.0 / 3.0)) // both ties share the min rank
    assert(byVal(40.0) == Set(1.0))
    val withNull = Seq(Some(1.0), None).toDF("x")
    val nn = Profile.percentRank(withNull, "x")
      .select("pct_rank").as[Option[Double]].collect()
    assert(nn.count(_.isEmpty) == 1)
    val single = Seq(5.0, 5.0).toDF("x")
    assert(Profile.percentRank(single, "x")
      .select("pct_rank").as[Double].collect().forall(_ == 0.0))
    val allNull = Seq[Option[Double]](None, None).toDF("x")
    assert(Profile.percentRank(allNull, "x")
      .select("pct_rank").as[Option[Double]].collect().forall(_.isEmpty))
    // the prefix window is PARTITIONED by the range bin — never a
    // single-task global orderBy over the histogram
    val plan = Profile.percentRank(df, "x")
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(_b"), plan)
    // few distinct values with many buckets: bins are sparse, ranks exact
    val sparse = Seq(1.0, 100.0, 1000.0, 1000.0).toDF("x")
    val sp = Profile.percentRank(sparse, "x")
      .select("x", "pct_rank").as[(Double, Double)].collect().toMap
    assert(sp(1.0) == 0.0 && sp(100.0) == 1.0 / 3.0 && sp(1000.0) == 2.0 / 3.0)
  }

  test("percentRankByGroup: independent ECDFs per stratum; null and singleton groups safe") {
    val df = Seq(
      ("a", Some(10.0)), ("a", Some(20.0)), ("a", Some(20.0)), ("a", Some(40.0)),
      ("b", Some(100.0)), ("b", Some(200.0)),
      ("c", Some(7.0)),            // singleton group -> 0.0
      ("a", None)                  // null value -> null rank
    ).toDF("g", "x")
    val out = Profile.percentRankByGroup(df, Seq("g"), "x")
      .select("g", "x", "pct_rank")
      .as[(String, Option[Double], Option[Double])].collect()
    val a = out.filter(r => r._1 == "a" && r._2.isDefined)
      .map(r => r._2.get -> r._3.get).toMap
    assert(a(10.0) == 0.0 && a(20.0) == 1.0 / 3.0 && a(40.0) == 1.0)
    val b = out.filter(_._1 == "b").map(r => r._2.get -> r._3.get).toMap
    assert(b(100.0) == 0.0 && b(200.0) == 1.0)
    assert(out.find(_._1 == "c").get._3.contains(0.0))
    assert(out.exists(r => r._1 == "a" && r._2.isEmpty && r._3.isEmpty))
    // matches the global percentRank when there is exactly one stratum
    val one = df.filter($"g" === "a").withColumn("k", lit("only"))
    val viaGroup = Profile.percentRankByGroup(one, Seq("k"), "x")
      .select("x", "pct_rank").as[(Option[Double], Option[Double])]
      .collect().toSet
    val global = Profile.percentRank(one, "x")
      .select("x", "pct_rank").as[(Option[Double], Option[Double])]
      .collect().toSet
    assert(viaGroup == global)
  }

  test("robustScale: (x - median)/iqr with exact bounds; zero-iqr and nulls safe") {
    // 1..8: q1 = 2.75, med = 4.5, q3 = 6.25 -> iqr = 3.5
    val df = (1 to 8).map(_.toDouble).toDF("x")
    val out = Profile.robustScale(df, "x")
      .select("x", "scaled").as[(Double, Double)].collect().toMap
    assert(out(1.0) == (1.0 - 4.5) / 3.5)
    assert(out(8.0) == (8.0 - 4.5) / 3.5)
    assert(out(4.0) == (4.0 - 4.5) / 3.5)
    val const = Seq(7.0, 7.0, 7.0).toDF("x")
    assert(Profile.robustScale(const, "x")
      .select("scaled").as[Double].collect().forall(_ == 0.0))
    val withNull = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    val nn = Profile.robustScale(withNull, "x")
      .select("scaled").as[Option[Double]].collect()
    assert(nn.count(_.isEmpty) == 1)
    val plan = Profile.robustScale(df, "x")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }

  test("outlierFlags: planted outlier flags both ways, bulk does not") {
    // 100 values at ~10 plus one at 1000: z and iqr both catch it
    val df = ((1 to 100).map(i => 10.0 + (i % 5) * 0.1) :+ 1000.0).toDF("x")
    val out = Profile.outlierFlags(df, "x")
      .select("x", "z_outlier", "iqr_outlier")
      .as[(Double, Boolean, Boolean)].collect()
    val (planted, bulk) = out.partition(_._1 == 1000.0)
    assert(planted.length == 1 && planted.head._2 && planted.head._3)
    assert(bulk.forall(r => !r._2 && !r._3))
    // nulls flag null; an all-null column yields null flags everywhere
    val withNull = Seq(Some(1.0), None).toDF("x")
    val nf = Profile.outlierFlags(withNull, "x")
      .select("z_outlier").as[Option[Boolean]].collect()
    assert(nf.count(_.isEmpty) == 1)
    val allNull = Seq[Option[Double]](None, None).toDF("x")
    val an = Profile.outlierFlags(allNull, "x")
      .select("z_outlier", "iqr_outlier")
      .as[(Option[Boolean], Option[Boolean])].collect()
    assert(an.forall(r => r._1.isEmpty && r._2.isEmpty))
    // the flag pass is narrow: stats are driver metadata, no join
    val plan = Profile.outlierFlags(df, "x")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }

  test("numericByGroup: per-group stats match the single-group global profile") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(2.0)), ("a", None),
      ("b", Some(10.0))
    ).toDF("g", "x")
    val rows = Profile.numericByGroup(df, Seq("g"), "x")
      .orderBy("g").collect()
    assert(rows.length == 2)
    val a = rows(0)
    assert(a.getAs[Long]("n") == 3 && a.getAs[Long]("nulls") == 1 &&
      a.getAs[Long]("n_distinct") == 2)
    assert(a.getAs[Double]("min") == 1.0 && a.getAs[Double]("max") == 2.0)
    assert(math.abs(a.getAs[Double]("mean") - 5.0 / 3.0) < 1e-12)
    assert(a.getAs[Double]("p50") == 2.0) // percentile over {1,2,2}
    val b = rows(1)
    assert(b.getAs[Long]("n") == 1 && b.getAs[Double]("p25") == 10.0)
    // one-group input reproduces the global numeric() stats
    val g = Profile.numeric(df.filter($"g" === "a").select("x"), Seq("x")).collect()(0)
    assert(g.getAs[Long]("n") == a.getAs[Long]("n") &&
      g.getAs[Double]("p75") == a.getAs[Double]("p75") &&
      g.getAs[Double]("mean") == a.getAs[Double]("mean"))
  }

  test("keyConcentration: exact top-k shares, count ties break to ascending key, nulls excluded") {
    // 10×a, 5×b, 5×c, 2×d, plus nulls that must not count
    val rows = Seq.fill(10)("a") ++ Seq.fill(5)("c") ++ Seq.fill(5)("b") ++
      Seq.fill(2)("d") ++ Seq(null, null)
    val df = rows.toDF("k")
    val out = Profile.keyConcentration(df, "k", k = 3)
      .as[(Int, String, Long, Double, Double)].collect().toSeq
    // total = 22 non-null; the 5-count tie resolves b before c
    assert(out == Seq(
      (1, "a", 10L, 10.0 / 22.0, 10.0 / 22.0),
      (2, "b", 5L, 5.0 / 22.0, 15.0 / 22.0),
      (3, "c", 5L, 5.0 / 22.0, 20.0 / 22.0)), out.toString)
    // k beyond the distinct-key count returns every key, cum → 1.0
    val all = Profile.keyConcentration(df, "k", k = 10)
      .as[(Int, String, Long, Double, Double)].collect().toSeq
    assert(all.length == 4 && all.last._5 == 1.0, all.toString)
    // non-string keys stringify
    val nums = Profile.keyConcentration(
      Seq(7L, 7L, 8L).toDF("k"), "k", k = 2)
      .as[(Int, String, Long, Double, Double)].collect().toSeq
    assert(nums.map(r => (r._1, r._2, r._3)) == Seq((1, "7", 2L), (2, "8", 1L)))
    // the cut is a TakeOrdered over the histogram, not a global Sort of rows
    val plan = Profile.keyConcentration(df, "k", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("groupCentroidsE6: exact sums, trunc-toward-zero means on negatives, null rows drop") {
    import graft.operators.Profile
    val df = Seq(
      (Option("a"), Option(Seq(1.0f, -0.5f))),
      (Option("a"), Option(Seq(0.0f, -0.6f))),
      (Option("b"), Option(Seq(2.0f, 2.0f))),
      (None, Option(Seq(9.0f, 9.0f))),
      (Option("c"), None)
    ).toDF("g", "vec")
    val got = Profile.groupCentroidsE6(df, "g", "vec")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // a/pos1: floor(-0.5·10⁶) = -500000, floor(-0.6f widened = -0.600000023…·10⁶)
    // = -600001 → sum -1100001; div 2 TRUNCATES toward zero → -550000
    // (floor division would give -550001 — the direction is the contract)
    assert(got == Set(
      ("a", 0, 1000000L, 2L, 500000L),
      ("a", 1, -1100001L, 2L, -550000L),
      ("b", 0, 2000000L, 1L, 2000000L),
      ("b", 1, 2000000L, 1L, 2000000L)
    ), got.toString)
  }

  test("weightedPercentiles: mass-weighted ranks; weight≡1 degenerates to plain order stats") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions._
    // value 10 carries 1 unit of mass, value 100 carries 99 → W=100;
    // rank(q=0.5) = floor(0.5·99) = 49 → inside value 100's mass
    val d = Seq((10.0, 1L), (100.0, 99L)).toDF("v", "w")
    val got = Profile.weightedPercentiles(d, "v", col("w"), Seq(0.0, 0.005, 0.5, 1.0)).get
    assert(got == Seq(10.0, 10.0, 100.0, 100.0), got.toString)
    // zero/negative/null weights carry no mass
    val z = Seq((5.0, 0L), (7.0, 3L), (9.0, -2L)).toDF("v", "w")
    assert(Profile.weightedPercentiles(z, "v", col("w"), Seq(0.0, 1.0)).get == Seq(7.0, 7.0))
    assert(Profile.weightedPercentiles(
      Seq((5.0, 0L)).toDF("v", "w"), "v", col("w"), Seq(0.5)).isEmpty)
    // weight ≡ 1: the value at rank floor(q·(n−1)) of the sorted column
    val vs = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val u = vs.map((_, 1L)).toDF("v", "w")
    val sorted = vs.sorted
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    val gotU = Profile.weightedPercentiles(u, "v", col("w"), qs).get
    val refU = qs.map(q => sorted(math.floor(q * (vs.length - 1)).toInt))
    assert(gotU == refU, s"got=$gotU ref=$refU")
  }

  test("weightedPercentilesByGroup: per-group rank rule matches per-group weightedPercentiles") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("a", 10.0, 1L), ("a", 100.0, 99L), ("a", 50.0, 10L),
      ("b", 3.0, 5L), ("b", 7.0, 5L),
      ("c", 42.0, 0L) // zero-weight-only group emits nothing
    )
    val d = rows.toDF("g", "v", "w")
    val probs = Seq(0.1, 0.5, 0.9)
    val got = Profile.weightedPercentilesByGroup(d, "g", "v", col("w"), probs)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // reference: run the single-group operator on each group slice
    for (g <- Seq("a", "b")) {
      val slice = rows.filter(_._1 == g).map(t => (t._2, t._3)).toDF("v", "w")
      val ref = Profile.weightedPercentiles(slice, "v", col("w"), probs).get
      probs.zip(ref).foreach { case (q, exp) =>
        assert(got((g, math.round(q * 1000000.0))) == exp,
          s"g=$g q=$q got=${got((g, math.round(q * 1000000.0)))} exp=$exp")
      }
    }
    assert(!got.keys.exists(_._1 == "c"), got.toString)
    assert(got.size == 6, got.toString)
    intercept[IllegalArgumentException] {
      Profile.weightedPercentilesByGroup(d, "g", "v", col("w"), Seq(1.5))
    }
  }

  test("lorenzCurve: cumulative shares ascend to 1e6; pairs with massGini's ordering") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions._
    val d = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)).toDF("g", "w")
    val got = Profile.lorenzCurve(d, "g", col("w"))
      .orderBy("grp_rank")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 250000L, 100000L),
      ("b", 2L, 500000L, 300000L),
      ("c", 3L, 750000L, 600000L),
      ("d", 4L, 1000000L, 1000000L)
    ), got.toString)
    // zero-mass corpus emits nothing (matches massGini)
    assert(Profile.lorenzCurve(
      Seq(("a", 0L)).toDF("g", "w"), "g", col("w")).count() == 0)
  }

  test("expectationReport: one pass, per-rule violation counts; null fails its rule") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions._
    val d = Seq[(java.lang.Long, String)](
      (5L, "x"), (500L, "y"), (null, "z"), (7L, null)
    ).toDF("v", "s")
    val got = Profile.expectationReport(d, Seq(
        "v_small" -> (col("v") < 100),
        "s_not_null" -> col("s").isNotNull))
      .orderBy("rule")
      .as[(String, Long, Long, Long)].collect().toSeq
    // v_small: 500 fails, null v fails (unassessable) → 2 of 4
    // s_not_null: one null s → 1 of 4
    assert(got == Seq(
      ("s_not_null", 4L, 1L, 250000L),
      ("v_small", 4L, 2L, 500000L)
    ), got.toString)
    intercept[IllegalArgumentException] {
      Profile.expectationReport(d, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Profile.expectationReport(d, Seq("a" -> lit(true), "a" -> lit(false)))
    }
  }

  test("expectationReportByGroup: per-group violation rates in one pass; null groups drop") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions._
    val d = Seq(
      ("a", 5L), ("a", 500L), ("b", 7L), ("b", 9L), (null, 999L)
    ).toDF("g", "v")
    val got = Profile.expectationReportByGroup(d, "g",
        Seq("v_small" -> (col("v") < 100)))
      .orderBy("g")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", "v_small", 2L, 1L, 500000L),
      ("b", "v_small", 2L, 0L, 0L)
    ), got.toString)
    intercept[IllegalArgumentException] {
      Profile.expectationReportByGroup(d, "g", Seq.empty)
    }
  }

  test("cohenKappaE6: perfect, chance-level, and negative agreement; degenerate emits nothing") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions._
    // perfect agreement → 1e6
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    val p = Profile.cohenKappaE6(perfect, col("a"), col("b"))
      .as[(Long, Long, Long)].head()
    assert(p == ((3L, 3L, 1000000L)), p.toString)
    // the classic 2×2: cells (T,T)=20 (T,F)=5 (F,T)=10 (F,F)=15, n=50
    // agree=35; na: T=25 F=25; nb: T=30 F=20; chance=25·30+25·20=1250
    // kappa = (50·35−1250)/(2500−1250) = 500/1250 = 0.4 → 400000
    val cells = Seq.fill(20)(("T", "T")) ++ Seq.fill(5)(("T", "F")) ++
      Seq.fill(10)(("F", "T")) ++ Seq.fill(15)(("F", "F"))
    val k = Profile.cohenKappaE6(cells.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long)].head()
    assert(k == ((50L, 35L, 400000L)), k.toString)
    // systematic disagreement → negative kappa (trunc toward zero)
    val neg = Seq(("T", "F"), ("F", "T"), ("T", "F"), ("F", "T")).toDF("a", "b")
    val kn = Profile.cohenKappaE6(neg, col("a"), col("b"))
      .as[(Long, Long, Long)].head()
    assert(kn == ((4L, 0L, -1000000L)), kn.toString)
    // both raters constant and identical → pe = 1, undefined → empty
    val const = Seq(("T", "T"), ("T", "T")).toDF("a", "b")
    assert(Profile.cohenKappaE6(const, col("a"), col("b")).count() == 0)
    // null labels on either side drop
    val withNull = Seq(("T", "T"), (null, "T"), ("T", null)).toDF("a", "b")
    val kw = Profile.cohenKappaE6(withNull, col("a"), col("b"))
    assert(kw.count() == 0 || kw.as[(Long, Long, Long)].head()._1 == 1L)
  }

  test("trimmedMeanByGroup: outliers outside the band drop; exact integer mean") {
    import graft.operators.Profile
    // group a: 1..10 plus outlier 1000. n = 11.
    // p10 rank = floor(0.1·10) = 1 → lo = 2nd value = 2
    // p90 rank = floor(0.9·10) = 9 → hi = 10th value = 10
    // band [2, 10]: values 2..10 → sum 54, n 9, mean_e6 = 54e6 div 9 = 6e6
    val rows = (1L to 10L).map(("a", _)) :+ (("a", 1000L))
    val d = rows.toDF("g", "v")
    val got = Profile.trimmedMeanByGroup(d, "g", "v", 0.1, 0.9)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 9L, 6000000L)), got.toString)
    // two groups trim independently; truncating mean division
    val two = (rows ++ Seq(("b", 1L), ("b", 2L), ("b", 2L))).toDF("g", "v")
    val g2 = Profile.trimmedMeanByGroup(two, "g", "v", 0.1, 0.9)
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    // group b: n = 3, lo rank floor(0.1·2)=0 → 1, hi rank floor(0.9·2)=1 →
    // value at rank 1 = 2; band [1,2] keeps all → mean = 5e6/3 = 1666666
    assert(g2 == Seq(("a", 9L, 6000000L), ("b", 3L, 1666666L)), g2.toString)
    intercept[IllegalArgumentException] {
      Profile.trimmedMeanByGroup(d, "g", "v", 0.9, 0.1)
    }
    // empty input → empty output
    assert(Profile.trimmedMeanByGroup(
      Seq.empty[(String, Long)].toDF("g", "v"), "g", "v", 0.1, 0.9).count() == 0)
  }

  test("massGini: equal masses → 0; concentration raises it; hand-computed value") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions._
    // equal masses: gini = 0 exactly
    val eq = Seq(("a", 5L), ("b", 5L), ("c", 5L)).toDF("g", "w")
    val g0 = Profile.massGini(eq, "g", col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert(g0 == ((3L, 15L, 0L)), g0.toString)
    // masses 1,2,3,4 ascending: Σi·m = 1+4+9+16 = 30, S = 10, n = 4
    // gini = (60 − 50)/40 = 0.25 → 250000 ppm
    val d = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)).toDF("g", "w")
    val g1 = Profile.massGini(d, "g", col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert(g1 == ((4L, 10L, 250000L)), g1.toString)
    // rows pool per group before ranking; null/negative weights drop
    val pooled = Seq(("a", 1L), ("a", 1L), ("b", -7L), ("b", 2L)).toDF("g", "w")
    val g2 = Profile.massGini(pooled, "g", col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    // masses a=2, b=2 → gini 0
    assert(g2 == ((2L, 4L, 0L)), g2.toString)
    // zero total mass → empty (undefined, not 0)
    val z = Seq(("a", 0L)).toDF("g", "w")
    assert(Profile.massGini(z, "g", col("w")).count() == 0)
  }

  test("scoreMassCut: kept mass covers at least the target; drops come off the small tail") {
    import graft.operators.Profile
    import org.apache.spark.sql.functions._
    // mass: 1000+500+300+100+60+40 = 2000; keep 80% → 1600 target
    val d = Seq((1L, 1000L), (2L, 500L), (3L, 300L), (4L, 100L), (5L, 60L), (6L, 40L))
      .toDF("id", "score")
    val out = Profile.scoreMassCut(d, "score", keepMassPpm = 800000L)
      .filter(col("keep")).select("id").as[Long].collect().toSet
    val keptMass = Seq(1000L, 500L, 300L, 100L, 60L, 40L)
      .zip(1L to 6L).filter(p => out.contains(p._2)).map(_._1).sum
    assert(keptMass >= 1600L, s"kept=$out mass=$keptMass")
    // the cut is top-down: anything kept outranks everything dropped
    val dropped = Set(1L, 2L, 3L, 4L, 5L, 6L) -- out
    val minKept = Seq(1000L, 500L, 300L, 100L, 60L, 40L).zip(1L to 6L)
      .filter(p => out.contains(p._2)).map(_._1).min
    assert(dropped.forall(i => Seq(1000L, 500L, 300L, 100L, 60L, 40L)(i.toInt - 1) < minKept))
    // degenerate inputs: all-null scores → keep nothing, rows intact
    val z = Seq((1L, null.asInstanceOf[java.lang.Long])).toDF("id", "score")
    assert(Profile.scoreMassCut(z, "score", 500000L).filter(col("keep")).count() == 0)
    intercept[IllegalArgumentException] {
      Profile.scoreMassCut(d, "score", 0L)
    }
  }

  test("hllRegisters/hllEstimateRaw: mergeable, repartition-stable, estimate tracks exact") {
    import spark.implicits._
    val items = (0 until 20000).map(i => ("g", s"item-$i")) ++
      (0 until 300).map(i => ("h", s"other-$i"))
    val df = items.toDF("grp", "x")
    // determinism under physical layout: same registers at 1 and 13 partitions
    val r1 = Profile.hllRegisters(df.repartition(1), "grp", col("x"))
      .as[(String, Long, Long)].collect().toSet
    val r13 = Profile.hllRegisters(df.repartition(13), "grp", col("x"))
      .as[(String, Long, Long)].collect().toSet
    assert(r1 == r13)
    // mergeability: registers(A ∪ B) = per-bucket max of registers(A), registers(B)
    val a = df.filter(col("x") < "item-5")
    val b = df.filter(col("x") >= "item-5")
    val merged = Profile.hllRegisters(a, "grp", col("x"))
      .unionByName(Profile.hllRegisters(b, "grp", col("x")))
      .groupBy("group", "bucket").agg(max("m_rho").as("m_rho"))
      .as[(String, Long, Long)].collect().toSet
    assert(merged == r1, s"merged=${merged.size} whole=${r1.size}")
    // raw estimate tracks exact for 20k distincts (m=1024, ~3% σ; the
    // observed draw sits at −11%, within a few σ of the raw estimator)
    val est = Profile.hllEstimateRaw(df, "grp", col("x"))
      .as[(String, Long)].collect().toMap
    assert(math.abs(est("g") - 20000L) < 3000L, est.toString)
    // the documented raw-estimator small-range bias is visible on the
    // 300-distinct group (over-reads without linear counting) — the
    // gate exposes it by emitting exact alongside
    assert(est("h") > 300L, est.toString)
    // registers are bounded: ≤ 1024 rows per group, ρ within [1, 55]
    assert(r1.count(_._1 == "g") <= 1024)
    assert(r1.forall(r => r._3 >= 1L && r._3 <= 55L))
  }

  test("cmsSketch/cmsEstimates: one-sided guarantee, forced collisions, sum-mergeability") {
    import spark.implicits._
    val items = (0 until 5000).map(i => s"w-${i % 200}") // 200 distinct, 25 each
    val df = items.toDF("x")
    // wide sketch: estimates likely exact, NEVER below true
    val sk = Profile.cmsSketch(df, col("x"), depth = 4, width = 1024)
    val qs = (0 until 200 by 17).map(i => s"w-$i").toDF("item")
    val est = Profile.cmsEstimates(sk, qs, 4, 1024)
      .as[(String, Long)].collect().toMap
    assert(est.values.forall(_ >= 25L), est.toString)
    // tiny width FORCES collisions: still one-sided (>= true), some above
    val skTiny = Profile.cmsSketch(df, col("x"), depth = 2, width = 16)
    val estTiny = Profile.cmsEstimates(skTiny, qs, 2, 16)
      .as[(String, Long)].collect().toMap
    assert(estTiny.values.forall(_ >= 25L), estTiny.toString)
    assert(estTiny.values.exists(_ > 25L), estTiny.toString)
    // cells sum-merge: sketch(A) + sketch(B) == sketch(A ∪ B)
    val a = df.limit(2500)
    val b = df.exceptAll(a)
    val merged = Profile.cmsSketch(a, col("x"))
      .unionByName(Profile.cmsSketch(b, col("x")))
      .groupBy("row", "col").agg(sum("cnt").as("cnt"))
      .as[(Long, Long, Long)].collect().toSet
    val whole = sk.as[(Long, Long, Long)].collect().toSet
    assert(merged == whole)
    // unknown item estimates 0 on the wide sketch (no colliding mass in
    // at least one row, overwhelmingly)
    val unk = Profile.cmsEstimates(sk, Seq("never-seen-xyz").toDF("item"), 4, 1024)
      .as[(String, Long)].collect().head._2
    assert(unk == 0L, unk.toString)
  }

  test("hllOverlapMatrix: inclusion-exclusion tracks known overlaps; disjoint pairs near zero") {
    import spark.implicits._
    // A = 0..9999, B = 5000..14999 (true overlap 5000), C disjoint 2000
    val rows = (0 until 10000).map(i => ("A", s"it-$i")) ++
      (5000 until 15000).map(i => ("B", s"it-$i")) ++
      (0 until 2000).map(i => ("C", s"other-$i"))
    val got = Profile.hllOverlapMatrix(rows.toDF("g", "x"), "g", col("x"))
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val ab = got(("A", "B"))
    // union ≈ 15000, inter ≈ 5000 — raw-HLL tolerances (~±10%)
    assert(math.abs(ab._5 - 15000L) < 1800L, ab.toString)
    assert(math.abs(ab._6 - 5000L) < 1800L, ab.toString)
    // disjoint pairs estimate near zero (raw, may be slightly negative)
    val ac = got(("A", "C"))
    assert(math.abs(ac._6) < 1200L, ac.toString)
    // single-source estimates equal the standalone estimator exactly
    val solo = Profile.hllEstimateRaw(rows.toDF("g", "x"), "g", col("x"))
      .as[(String, Long)].collect().toMap
    assert(ab._3 == solo("A") && ab._4 == solo("B"), (ab, solo).toString)
  }

  test("benfordDeviation: hand-computed digits and deviations; non-positive and null excluded") {
    import spark.implicits._
    // group a: values 1..19 → digit 1: 11 (1, 10..19), digits 2..9: 1 each
    val a = (1 to 19).map(v => ("a", Some(v.toLong)))
    // group b: powers of 2 up to 64 (1,2,4,8,16,32,64) → digits 1,2,4,8,1,3,6
    val b = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L).map(v => ("b", Some(v)))
    // excluded rows: zero, negative, null value, null group
    val noise = Seq(("a", Some(0L)), ("a", Some(-7L)), ("a", None),
      (null: String, Some(5L)))
    val df = (a ++ b ++ noise).toDF("g", "v")
    val got = Profile.benfordDeviation(df, "g", col("v"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // expectations: floor(log10(1+1/d)·1e6)
    val e = Profile.benfordExpectedPpm
    assert(e.head == 301029L && e(1) == 176091L, e.toString)
    // a: n=19; digit 1: cnt 11, freq 11e6/19 = 578947, dev vs 301029
    assert(got(("a", 1L)) == ((11L, 578947L, 277918L)), got(("a", 1L)).toString)
    // a digit 2: cnt 1, freq 52631, dev |52631-176091|
    assert(got(("a", 2L)) == ((1L, 52631L, 123460L)), got(("a", 2L)).toString)
    // b: n=7; digit 1 twice (1, 16): freq 285714, dev 15315
    assert(got(("b", 1L)) == ((2L, 285714L, 15315L)), got(("b", 1L)).toString)
    // digit rows only for observed digits; excluded rows never counted
    assert(!got.contains(("a", 5L)) || got(("a", 5L))._1 == 1L)
    assert(got.keys.forall(k => k._1 == "a" || k._1 == "b"))
    assert(got.count(_._1._1 == "b") == 6, got.keys.toString) // digits 1,2,3,4,6,8
  }

  test("rankCorrelationByGroup: agreement, reversal, one swap, n<2 dropped") {
    import spark.implicits._
    val df = Seq(
      // group a: same order → ρ = τ = 1
      ("a", 1L, 10L, 100L), ("a", 2L, 20L, 200L), ("a", 3L, 30L, 300L),
      // group b: reversed → ρ = τ = −1 (n=4: Σd² = 20, D = 6)
      ("b", 1L, 1L, 40L), ("b", 2L, 2L, 30L), ("b", 3L, 3L, 20L), ("b", 4L, 4L, 10L),
      // group c: one adjacent swap of the last two (n=3: Σd² = 2, D = 1)
      ("c", 1L, 1L, 1L), ("c", 2L, 2L, 3L), ("c", 3L, 3L, 2L),
      // group d: single row → dropped (correlation undefined)
      ("d", 1L, 5L, 5L)
    ).toDF("g", "id", "x", "y")
    val got = Profile.rankCorrelationByGroup(df, "g", "id", "x", "y")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("a") == ((3L, 0L, 0L, 1000000L, 1000000L)), got("a").toString)
    assert(got("b") == ((4L, 20L, 6L, -1000000L, -1000000L)), got("b").toString)
    // ρ = (24 − 12)/24 = 0.5; τ = (6 − 4)/6 = 1/3 → 333333 (trunc)
    assert(got("c") == ((3L, 2L, 1L, 500000L, 333333L)), got("c").toString)
    assert(!got.contains("d"))
  }

  test("rankCorrelationByGroup: inversion-counting plan equals brute force across block/round boundaries; no join carries the rows") {
    import spark.implicits._
    // deterministic pseudo-random permutations via a multiplicative
    // hash — group sizes straddle the seed block (4), one merge round
    // (8), and a non-power-of-two tail spanning three rounds (27)
    def perm(n: Int, salt: Long): Seq[Long] =
      (1 to n).sortBy(i => (i * 2654435761L + salt) % 1000003L).map(_.toLong)
    val rows = for {
      (g, n, salt) <- Seq(("p3", 3, 1L), ("p4", 4, 2L), ("p5", 5, 3L),
        ("p8", 8, 4L), ("p9", 9, 5L), ("p27", 27, 6L))
      (y, i) <- perm(n, salt).zipWithIndex
    } yield (g, i.toLong, i.toLong, y) // x = id order, y = permuted
    val df = rows.toDF("g", "id", "x", "y")
    val got = Profile.rankCorrelationByGroup(df, "g", "id", "x", "y",
        seedBlockSize = 4)
      .select("g", "n_discordant")
      .as[(String, Long)].collect().toMap
    // brute force over the same permutations
    val exp = Seq(("p3", 3, 1L), ("p4", 4, 2L), ("p5", 5, 3L),
      ("p8", 8, 4L), ("p9", 9, 5L), ("p27", 27, 6L)).map { case (g, n, salt) =>
      val p = perm(n, salt)
      g -> (for { i <- p.indices; j <- i + 1 until p.length
                  if p(i) > p(j) } yield 1).size.toLong
    }.toMap
    assert(got == exp, s"got=$got exp=$exp")
    // default block size must agree too (single-seed-block path)
    val gotDefault = Profile.rankCorrelationByGroup(df, "g", "id", "x", "y")
      .select("g", "n_discordant").as[(String, Long)].collect().toMap
    assert(gotDefault == exp)
    // the two-level rank path (forced by a zero threshold) must agree
    // with the window path bit-for-bit — the adaptive switch is a plan
    // choice, never a semantics choice
    val gotBucketed = Profile.rankCorrelationByGroup(df, "g", "id", "x", "y",
        seedBlockSize = 4, rankWindowThreshold = 0L)
      .select("g", "n_discordant").as[(String, Long)].collect().toMap
    assert(gotBucketed == exp)
    // plan shape: the discordant count must NOT ride a row-level self
    // join — the only joins in the plan are the per-group metadata
    // stats⋈disc assembly (key = the group column alone)
    val plan = Profile.rankCorrelationByGroup(df, "g", "id", "x", "y", 4)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val joins = plan.collect { case j: Join => j }
    assert(joins.forall(_.condition.forall(c =>
      !c.toString.contains("_rx") && !c.toString.contains("_ry"))),
      s"rank columns leaked into a join condition:\n$plan")
    // bounded per-task rows on the FORCED MULTI-ROUND path, two pins:
    // (a) the operator's own plan must contain NO window ordered by a
    // row-level rank (_rx/_ry) — the merge rounds reduce over the grid
    // HISTOGRAM, so the only windows left are bucket-row suffix sums
    // ordered by _bky; (b) the rank assignment's row_number window
    // (inside withinGroupRanks, checkpoint-hidden from (a)'s plan) must
    // partition by (group, bucket), never the group alone.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = plan.collect { case w: LWindow => w }
    val rankOrdered = wins.filter(_.orderSpec.exists(o =>
      Seq("_rx", "_ry").exists(o.child.toString.contains)))
    assert(rankOrdered.isEmpty,
      "a merge-round window orders row-level ranks (whole-span " +
        s"single-task sort):\n${rankOrdered.map(w => (w.partitionSpec, w.orderSpec)).mkString("\n")}")
    val rankPlan = graft.operators.Sampling.withinGroupRanks(
      df.select(col("g").as("_g"), col("x").as("_k"), col("id").as("_id")),
      1024, tieCols = Seq("_id")).get.queryExecution.optimizedPlan
    val rowNum = rankPlan.collect { case w: LWindow => w }
      .filter(_.orderSpec.exists(_.child.toString.contains("_k")))
    assert(rowNum.nonEmpty, s"expected a row-level rank window in:\n$rankPlan")
    assert(rowNum.forall(_.partitionSpec.size >= 2),
      "the rank window partitions by the group alone (whole-group " +
        s"single-task sort):\n${rowNum.map(w => (w.partitionSpec, w.orderSpec)).mkString("\n")}")
  }

  test("withinGroupRanks: a >= 2^63 key span refuses loudly; extreme magnitudes under the span still rank exactly") {
    import spark.implicits._
    // MinValue..MaxValue span wraps subtractExact → loud refusal, not
    // silently corrupted bucket order
    val e = intercept[IllegalArgumentException] {
      graft.operators.Sampling.withinGroupRanks(
        Seq(("g", Long.MinValue, 1L), ("g", Long.MaxValue, 2L))
          .toDF("_g", "_k", "_id"), 1024, tieCols = Seq("_id"))
    }
    assert(e.getMessage.contains("span"), e.getMessage)
    assert(e.getMessage.contains("remap"), e.getMessage) // remedy named
    // span of 2^63 - 1 (MinValue..-1) is the legal extreme: exact ranks
    val ok = graft.operators.Sampling.withinGroupRanks(
      Seq(("g", -1L, 2L), ("g", Long.MinValue, 1L), ("g", -5L, 3L))
        .toDF("_g", "_k", "_id"), 1024, tieCols = Seq("_id")).get
      .select(col("_id"), col("_rank")).as[(Long, Long)].collect().toMap
    assert(ok == Map(1L -> 1L, 3L -> 2L, 2L -> 3L), ok.toString)
  }

  test("rankCorrelationByGroup: tied scores break by id — pinned order, not a crash") {
    import spark.implicits._
    // x ties everywhere: rank order = id order; y agrees with id → τ = ρ = 1
    val df = Seq(("g", 1L, 7L, 1L), ("g", 2L, 7L, 2L), ("g", 3L, 7L, 3L))
      .toDF("g", "id", "x", "y")
    val r = Profile.rankCorrelationByGroup(df, "g", "id", "x", "y").collect().head
    assert(r.getLong(4) == 1000000L && r.getLong(5) == 1000000L)
  }

  test("aucByGroup: perfect separation, ties at ½, single-class groups dropped") {
    import spark.implicits._
    val df = Seq(
      // a: positives strictly above negatives → AUC 1
      ("a", true, 10L), ("a", true, 20L), ("a", false, 1L), ("a", false, 2L),
      // b: pos {3,1}, neg {2} → one win of two pairs → AUC 0.5
      ("b", true, 3L), ("b", true, 1L), ("b", false, 2L),
      // c: all mass tied at one value → AUC exactly ½
      ("c", true, 5L), ("c", false, 5L),
      // d: one class only → dropped
      ("d", true, 9L)
    ).toDF("g", "y", "v")
    val got = Profile.aucByGroup(df, "g", col("y"), col("v"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((2L, 2L, 1000000L)), got("a").toString)
    assert(got("b") == ((2L, 1L, 500000L)), got("b").toString)
    assert(got("c") == ((1L, 1L, 500000L)), got("c").toString)
    assert(!got.contains("d"))
  }

  test("calibrationTable: two exact halves, rates and means hand-computed, nulls drop") {
    import spark.implicits._
    // scores 1..10, labels true on the top half; median bound = 5.5
    val df = (1L to 10L).map(v => (v >= 6L, v)).toDF("y", "v")
    val got = Profile.calibrationTable(df, col("y"), "v", nBins = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(0L) == ((5L, 0L, 0L, 3000000L)), got(0L).toString)
    assert(got(1L) == ((5L, 5L, 1000000L, 8000000L)), got(1L).toString)
    // null label or score rows never count
    val withNull = df.union(Seq((null.asInstanceOf[java.lang.Boolean], 7L))
      .toDF("y", "v").select(col("y").cast("boolean"), col("v")))
    val n2 = Profile.calibrationTable(withNull, col("y"), "v", 2)
      .agg(sum("n")).as[Long].collect().head
    assert(n2 == 10L)
  }

  test("distributionShift: identical → zero; constant shift → W1 = shift, KS = 1 on disjoint ranges") {
    import spark.implicits._
    val df = Seq(
      ("ref", 0L), ("ref", 10L),
      // same: identical to ref → ks = w1 = 0
      ("same", 0L), ("same", 10L),
      // plus5: every value shifted +5 → W1 = 5, KS = ½ (interleaved steps)
      ("plus5", 5L), ("plus5", 15L),
      // far: disjoint above the ref range → KS = 1, W1 = 100 (means 100 apart)
      ("far", 100L), ("far", 110L)
    ).toDF("g", "v")
    val got = Profile.distributionShift(df, "g", "v", "ref")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("same") == ((2L, 2L, 0L, 0L)), got("same").toString)
    assert(got("plus5") == ((2L, 2L, 500000L, 5000000L)), got("plus5").toString)
    assert(got("far") == ((2L, 2L, 1000000L, 100000000L)), got("far").toString)
    assert(!got.contains("ref")) // the reference never compares to itself
  }
}
