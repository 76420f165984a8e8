package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("FnvHash64 matches the published FNV-1a test vectors") {
    val got = Seq("", "a", "foobar").toDF("s")
      .select(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.plans.FnvHash64(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("s")))))
      .as[Long].collect().toSeq
    assert(got == Seq(0xcbf29ce484222325L, 0xaf63dc4c8601ec8cL, 0x85944171f73967e8L),
      got.map(_.toHexString).toString)
  }

  test("deterministic sample: stable across runs and under appends; fraction roughly holds") {
    val df = spark.range(10000).toDF("id")
    val s1 = Sampling.deterministicSample(df, "id", 0.25).as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(df, "id", 0.25).as[Long].collect().toSet
    assert(s1 == s2)
    // append-stability: sampling a subset then the rest = sampling the union
    val lo = Sampling.deterministicSample(df.filter($"id" < 5000), "id", 0.25)
      .as[Long].collect().toSet
    val hi = Sampling.deterministicSample(df.filter($"id" >= 5000), "id", 0.25)
      .as[Long].collect().toSet
    assert((lo ++ hi) == s1)
    // 1/1024-granular threshold: expect ~2500, generous tolerance
    assert(s1.size > 2000 && s1.size < 3000, s1.size.toString)
    // independent salt draws a genuinely different sample
    val other = Sampling.deterministicSample(df, "id", 0.25, salt = "other")
      .as[Long].collect().toSet
    assert(other != s1)
    // fraction bounds behave
    assert(Sampling.deterministicSample(df, "id", 1.0).count() == 10000)
    assert(Sampling.deterministicSample(df, "id", 0.0).count() == 0)
  }

  test("stratified sample applies per-stratum fractions in one narrow pass") {
    val df = spark.range(6000).select(
      col("id"),
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b")
        .otherwise("c").as("stratum"))
    val out = Sampling.stratifiedSample(df, "id", "stratum",
      Map("a" -> 1.0, "b" -> 0.5), defaultFraction = 0.0)
    val counts = out.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(counts("a") == 2000)                       // all of a
    assert(counts("b") > 800 && counts("b") < 1200)   // ~half of b
    assert(!counts.contains("c"))                     // none of c
    // narrow: no join, no exchange — the thresholds compile to a CASE
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }

  test("weighted sample: probability scales with the weight, nulls drop, stays narrow") {
    val df = spark.range(10000).select(col("id"),
      (col("id") % 4).cast("double").as("w4")) // weights 0,1,2,3 (clamped to 1)
    // weight 1.0 everywhere == plain deterministic sample at the fraction
    val plain = Sampling.deterministicSample(df, "id", 0.5)
      .select("id").as[Long].collect().toSet
    val unit = Sampling.weightedSample(df, "id", lit(1.0), 0.5)
      .select("id").as[Long].collect().toSet
    assert(unit == plain)
    // ...at EVERY fraction, including ones where round != floor (0.0005 ×
    // 1024 = 0.512 → threshold 1): both samplers share the round rule
    val tinyPlain = Sampling.deterministicSample(df, "id", 0.0005)
      .select("id").as[Long].collect().toSet
    val tinyUnit = Sampling.weightedSample(df, "id", lit(1.0), 0.0005)
      .select("id").as[Long].collect().toSet
    assert(tinyUnit == tinyPlain)
    assert(tinyPlain.nonEmpty) // threshold rounds UP to 1: bucket 0 kept
    // weight 0 drops everything; over-1 weights clamp to the fraction
    assert(Sampling.weightedSample(df, "id", lit(0.0), 0.5).count() == 0)
    val clamped = Sampling.weightedSample(df, "id", col("w4"), 0.5)
      .select("id").as[Long].collect().toSet
    // rows with w4 == 0 never appear; w4 >= 1 behaves like weight 1
    assert(!clamped.exists(_ % 4 == 0))
    assert(clamped == plain.filter(_ % 4 != 0))
    // half weight ⇒ a SUBSET of the full-weight sample (threshold only
    // shrinks), at roughly half the rate
    val half = Sampling.weightedSample(df, "id", lit(0.5), 0.5)
      .select("id").as[Long].collect().toSet
    assert(half.subsetOf(plain))
    assert(half.size > plain.size / 3 && half.size < 2 * plain.size / 3)
    // null weight drops, not keeps
    val withNull = df.select(col("id"),
      when(col("id") < 5000, lit(1.0)).as("w")) // null for id >= 5000
    val nn = Sampling.weightedSample(withNull, "id", col("w"), 1.0)
      .select("id").as[Long].collect()
    assert(nn.forall(_ < 5000) && nn.nonEmpty)
    // still narrow: codegen'd hash + filter, no join/exchange
    val plan = Sampling.weightedSample(df, "id", col("w4"), 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }

  test("mixToTarget: binding stratum keeps all, others match deterministicSample, unlisted drop") {
    // a: 1000 rows, b: 500 rows, c unlisted. Equal targets → b binds
    // (T = 500), a thins to 1/2, c drops entirely.
    val df = ((1L to 1000L).map(i => (i, "a")) ++
      (1001L to 1500L).map(i => (i, "b")) ++
      (1501L to 1600L).map(i => (i, "c"))).toDF("id", "src")
    val out = Sampling.mixToTarget(df, "id", "src",
        Map("a" -> 1.0, "b" -> 1.0))
      .select("id", "src").as[(Long, String)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(bySrc("b") == (1001L to 1500L).toSet) // binding: keeps everything
    assert(!bySrc.contains("c"))
    // stratum a keeps EXACTLY the plain deterministic 1/2 sample — the
    // mixture decision is the same FNV membership at the derived fraction
    val plain = Sampling.deterministicSample(
        df.filter(col("src") === "a"), "id", 0.5)
      .select("id").as[Long].collect().toSet
    assert(bySrc("a") == plain)
    // weights are proportional, not normalized: scaling both changes nothing
    val scaled = Sampling.mixToTarget(df, "id", "src",
        Map("a" -> 7.0, "b" -> 7.0))
      .select("id").as[Long].collect().toSet
    assert(scaled == out.map(_._1).toSet)
    intercept[IllegalArgumentException] {
      Sampling.mixToTarget(df, "id", "src", Map("a" -> 0.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixToTarget(df, "id", "src", Map.empty[String, Double])
    }
    // membership is narrow: thresholds collected at call time compile to
    // a CASE chain — the sampling pass itself has no join, no exchange
    val plan = Sampling.mixToTarget(df, "id", "src", Map("a" -> 1.0, "b" -> 1.0))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }

  test("temperatureMix: alpha flattens source skew; equals mixToTarget at sqrt weights; alpha=1 is identity") {
    // a: 1600 rows, b: 400 rows. alpha=0.5: p ∝ √n → b (smallest) keeps
    // all, a keeps (√(n_a)·T)/n_a = √(400/1600) = 1/2 of itself
    val df = ((1L to 1600L).map(i => (i, "a")) ++
      (1601L to 2000L).map(i => (i, "b"))).toDF("id", "src")
    val out = Sampling.temperatureMix(df, "id", "src", alpha = 0.5)
      .select("id", "src").as[(Long, String)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(bySrc("b") == (1601L to 2000L).toSet) // low-resource keeps all
    // a's kept fraction lands at the derived 1/2 (FNV thresholds are
    // exact bucket counts, so the realized fraction tracks closely)
    assert(math.abs(bySrc("a").size / 1600.0 - 0.5) < 0.05,
      s"got ${bySrc("a").size}")
    // exactly the mixToTarget membership at the sqrt weight table
    val viaTarget = Sampling.mixToTarget(df, "id", "src",
        Map("a" -> math.sqrt(1600.0), "b" -> math.sqrt(400.0)))
      .select("id").as[Long].collect().toSet
    assert(out.map(_._1).toSet == viaTarget)
    // alpha = 1 reproduces the natural mix: everything survives
    assert(Sampling.temperatureMix(df, "id", "src", alpha = 1.0).count() == 2000L)
    // flattening is monotone in alpha: smaller alpha keeps less of the
    // dominant stratum (b always keeps all as the binding stratum)
    val sharper = Sampling.temperatureMix(df, "id", "src", alpha = 0.25)
      .filter(col("src") === "a").count()
    assert(sharper < bySrc("a").size)
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(df, "id", "src", alpha = 0.0)
    }
    // empty input -> empty output, no crash on the empty weight table
    assert(Sampling.temperatureMix(df.filter(lit(false)), "id", "src", 0.5)
      .count() == 0L)
  }

  test("splitByHash: disjoint exhaustive labels; train == deterministicSample; stable under growth") {
    import spark.implicits._
    val df = (1L to 2000L).toDF("id")
    val out = Sampling.splitByHash(df, "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, Option[String])].collect()
    // fractions sum to 1 -> every row labeled, shares roughly honored
    assert(out.forall(_._2.isDefined))
    val byLabel = out.groupBy(_._2.get).view.mapValues(_.length).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > 1400 && byLabel("train") < 1800)
    // the train split IS deterministicSample(0.8): same bucket rule
    val direct = Sampling.deterministicSample(df, "id", 0.8)
      .select("id").as[Long].collect().toSet
    assert(out.filter(_._2.contains("train")).map(_._1).toSet == direct)
    // growing train's share only ADDS rows to train (leakage safety)
    val grown = Sampling.splitByHash(df, "id", Seq("train" -> 0.9, "rest" -> 0.1))
      .filter(col("split") === "train").select("id").as[Long].collect().toSet
    assert(direct.subsetOf(grown))
    // a fraction shortfall leaves a null holdout; overshoot is rejected
    val hold = Sampling.splitByHash(df, "id", Seq("train" -> 0.5))
      .select("split").as[Option[String]].collect()
    assert(hold.exists(_.isEmpty) && hold.exists(_.contains("train")))
    intercept[IllegalArgumentException] {
      Sampling.splitByHash(df, "id", Seq("a" -> 0.8, "b" -> 0.3))
    }
    // narrow: no join, no exchange
    val plan = Sampling.splitByHash(df, "id", Seq("a" -> 0.5, "b" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan)
  }

  test("sampleExactN: exact count, equals brute-force top-n by hash, layout-stable") {
    import org.apache.spark.sql.graft.ColumnBridge
    val df = spark.range(5000).toDF("id")
    val out = Sampling.sampleExactN(df, "id", n = 37, salt = "s")
      .select("id").as[Long].collect().toSet
    assert(out.size == 37)
    // brute force: rank every row by (hash desc, key desc), take 37
    val h = ColumnBridge.column(graft.plans.FnvHash64(
      ColumnBridge.expression(concat($"id".cast("string"), lit(":s")))))
    val brute = df.select($"id", h.as("h"))
      .orderBy(col("h").desc, col("id").desc).limit(37)
      .select("id").as[Long].collect().toSet
    assert(out == brute)
    // partition layout does not change the sample
    val re = Sampling.sampleExactN(df.repartition(13), "id", n = 37, salt = "s")
      .select("id").as[Long].collect().toSet
    assert(re == out)
    // n >= rows keeps everything; the selection reduces through the
    // bounded heap + broadcast semi-join, never a global Sort
    assert(Sampling.sampleExactN(df, "id", n = 10000).count() == 5000)
    val plan = Sampling.sampleExactN(df, "id", n = 37)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Sort"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("sampleExactNPerGroup: exactly n per group, brute-force parity, small groups keep all") {
    import org.apache.spark.sql.graft.ColumnBridge
    val df = spark.range(1000)
      .select($"id", ($"id" % 4).cast("string").as("g"))
      .union(Seq((9999L, "tiny"), (9998L, "tiny")).toDF("id", "g"))
    val out = Sampling.sampleExactNPerGroup(df, "id", "g", n = 7, salt = "s")
      .select("g", "id", "rank").as[(String, Long, Int)].collect()
    val byG = out.groupBy(_._1)
    assert(byG("0").length == 7 && byG("3").length == 7)
    assert(byG("tiny").map(_._2).toSet == Set(9999L, 9998L)) // < n keeps all
    // ranks are 1..k per group
    byG.values.foreach(rows => assert(rows.map(_._3).sorted.toSeq == (1 to rows.length)))
    // brute-force parity on one group: top-7 by (hash desc, id desc)
    val h = ColumnBridge.column(graft.plans.FnvHash64(
      ColumnBridge.expression(concat($"id".cast("string"), lit(":s")))))
    val brute = df.filter($"g" === "2").select($"id", h.as("h"))
      .orderBy(col("h").desc, col("id").desc).limit(7)
      .select("id").as[Long].collect().toSet
    assert(byG("2").map(_._2).toSet == brute)
    // per-group heap, not a window
    val plan = Sampling.sampleExactNPerGroup(df, "id", "g", n = 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("graft_topk"), plan)
  }

  test("quotaPerGroup: equals the row_number cut both directions; nulls drop; heap-reduced plan") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 30L), ("a", 4L, 20L),
      ("b", 5L, 5L), ("b", 6L, 7L),
      ("c", 7L, 1L)
    ).toDF("g", "id", "score")
    // keepSmallest: (score asc, id asc)
    val lo = Sampling.quotaPerGroup(df, "id", "g", "score", n = 2)
      .as[(String, Long, Int)].collect().toSet
    assert(lo == Set(("a", 1L, 1), ("a", 4L, 2), ("b", 5L, 1), ("b", 6L, 2),
      ("c", 7L, 1)), lo.toString)
    // keepLargest: (score desc, id desc) — the tie at 30 favors id 3
    val hi = Sampling.quotaPerGroup(df, "id", "g", "score", n = 2,
      keepSmallest = false).as[(String, Long, Int)].collect().toSet
    assert(hi == Set(("a", 3L, 1), ("a", 2L, 2), ("b", 6L, 1), ("b", 5L, 2),
      ("c", 7L, 1)), hi.toString)
    // null group / order / key rows drop
    val withNulls = df.union(Seq(
      (null, 8L, 1L), ("a", 9L, -99L), ("b", 10L, 2L)
    ).toDF("g", "id", "score"))
      .withColumn("score", when($"id" === 9L, lit(null)).otherwise($"score"))
    val n2 = Sampling.quotaPerGroup(withNulls, "id", "g", "score", n = 2)
      .as[(String, Long, Int)].collect().toSet
    assert(n2 == Set(("a", 1L, 1), ("a", 4L, 2), ("b", 10L, 1), ("b", 5L, 2),
      ("c", 7L, 1)), n2.toString)
    // the reduction is the bounded heap: partial-aggregated, no Window,
    // no Sort of the membership
    val plan = Sampling.quotaPerGroup(df, "id", "g", "score", n = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bottomk"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort"), plan)
  }

  test("epochSchedule: rank/pos equal the window brute force; prefixes stay proportional; windows stay bucket-bounded") {
    // skewed groups: 400 of 'big', 40 of 'mid', 4 of 'small'
    val rows = (0L until 400L).map(i => ("big", i * 3)) ++
      (0L until 40L).map(i => ("mid", i * 17 + 1)) ++
      (0L until 4L).map(i => ("small", i * 111 + 2))
    val df = rows.toDF("g", "id")
    val out = Sampling.epochSchedule(df, "id", "g", buckets = 8)
      .as[(String, Long, Long, Double)].collect()
    assert(out.length == rows.length)
    // brute force via a per-group window
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy("id")
    val brute = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("ng", count(lit(1)).over(Window.partitionBy("g")))
      .select($"g", $"id", $"rank",
        (lit(2L) * $"rank" - 1L).cast("double") /
          (lit(2L) * $"ng").cast("double"))
      .as[(String, Long, Long, Double)].collect().toSet
    assert(out.toSet == brute)
    // proportionality: any pos-prefix carries each group near its share
    val firstHalf = out.filter(_._4 < 0.5)
    val bigShare = firstHalf.count(_._1 == "big").toDouble / firstHalf.length
    assert(math.abs(bigShare - 400.0 / 444.0) < 0.02, bigShare.toString)
    // every row_number window partitions by (group, bucket), never the
    // group alone — the corpus-sized partition the design forbids
    val plan = Sampling.epochSchedule(df, "id", "g", buckets = 8)
      .queryExecution.optimizedPlan.toString
    val rnWindows = plan.linesIterator.filter(_.contains("row_number"))
    assert(rnWindows.forall(l => l.contains("_b")), plan)
    // null key/group rows drop
    val withNull = df.union(Seq(("x", null.asInstanceOf[java.lang.Long]))
      .map(t => (t._1, t._2: java.lang.Long)).toDF("g", "id"))
    assert(Sampling.epochSchedule(withNull, "id", "g").count() == rows.length)
    // empty input returns the right (empty) shape
    assert(Sampling.epochSchedule(df.filter(lit(false)), "id", "g").count() == 0)
  }

  test("deterministicShuffle: a total permutation matching the brute-force (hash, key) order; layout-stable; bucket-bounded windows") {
    import org.apache.spark.sql.graft.ColumnBridge
    val df = spark.range(0, 500).toDF("id")
    val out = Sampling.deterministicShuffle(df, "id", "s1")
    // positions are exactly 1..n (a permutation, no gaps/dups)
    assert(out.select("pos").as[Long].collect().sorted.toSeq == (1L to 500L))
    // brute force: driver-side sort by (signed hash, key)
    val h = ColumnBridge.column(graft.plans.FnvHash64(
      ColumnBridge.expression(concat(lit("s1:"), $"id".cast("string")))))
    val ref = df.withColumn("_h", h).as[(Long, Long)].collect()
      .sortBy { case (id, hh) => (hh, id) }.map(_._1).toSeq
    val got = out.orderBy("pos").select("id").as[Long].collect().toSeq
    assert(got == ref)
    // re-partitioning must not change the permutation
    val got2 = Sampling.deterministicShuffle(df.repartition(7), "id", "s1")
      .orderBy("pos").select("id").as[Long].collect().toSeq
    assert(got2 == ref)
    // an independent salt draws an independent order
    val got3 = Sampling.deterministicShuffle(df, "id", "s2")
      .orderBy("pos").select("id").as[Long].collect().toSeq
    assert(got3 != ref)
    // the row_number window partitions by the hash bucket, never global
    val plan = out.queryExecution.optimizedPlan.toString
    val rnWindows = plan.linesIterator.filter(_.contains("row_number")).toSeq
    assert(rnWindows.nonEmpty && rnWindows.forall(_.contains("_b")), plan)
  }

  test("tokenQuotaPerGroup: inclusive running totals in key order, boundary keeps, nulls drop") {
    val df = Seq(
      ("a", 1L, 50L), ("a", 2L, 100L), ("a", 3L, 50L), ("a", 4L, 1L),
      ("b", 5L, 300L), ("b", 6L, 1L),
      ("c", 7L, 200L)
    ).toDF("g", "id", "nt")
    val got = Sampling.tokenQuotaPerGroup(df, "id", "g", $"nt", budget = 200L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(got == Set(
      ("a", 1L, 50L, 50L, true),
      ("a", 2L, 100L, 150L, true),
      ("a", 3L, 50L, 200L, true),    // hits the budget exactly: keeps
      ("a", 4L, 1L, 201L, false),    // first token past the line drops
      ("b", 5L, 300L, 300L, false),  // one oversized head row drops alone
      ("b", 6L, 1L, 301L, false),
      ("c", 7L, 200L, 200L, true)
    ), got.toString)
    // null group / key / tokens rows drop
    val withNulls = Seq(
      (Option("a"), Option(1L), Option(10L)),
      (None, Option(2L), Option(10L)),
      (Option("a"), None, Option(10L)),
      (Option("a"), Option(3L), None)
    ).toDF("g", "id", "nt")
    assert(Sampling.tokenQuotaPerGroup(withNulls, "id", "g", $"nt", 100L)
      .count() == 1L)
    // empty input yields an empty, correctly-shaped frame
    val empty = Sampling.tokenQuotaPerGroup(df.limit(0), "id", "g", $"nt", 10L)
    assert(empty.columns.toSeq ==
      Seq("g", "id", "n_tokens", "cum_tokens", "keep"))
    assert(empty.count() == 0L)
    // the running-sum window partitions by (group, bucket), never the
    // bare group — the hot-domain funnel guard
    val plan = Sampling.tokenQuotaPerGroup(df, "id", "g", $"nt", 200L)
      .queryExecution.optimizedPlan.toString
    val wins = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(wins.nonEmpty, plan)
    assert(wins.exists(l => l.contains("_g") && l.contains("_b")), plan)
  }

  test("unimaxBudgets: smallest-first waterfill, epoch cap binds then budget rolls forward") {
    import graft.operators.Sampling
    // group token totals: a=10, b=100, c=1000; budget 500, 2 epochs.
    // visit a (share 500/3=166 > cap 20 → 20, rem 480), b (share
    // 480/2=240 > cap 200 → 200, rem 280), c (share 280/1=280 < cap → 280)
    val d = Seq(
      ("a", 4L), ("a", 6L),
      ("b", 100L),
      ("c", 999L), ("c", 1L),
      (null.asInstanceOf[String], 50L) // null group drops
    ).toDF("g", "nt")
    val out = Sampling.unimaxBudgets(d, "g", col("nt"), totalBudget = 500L, maxEpochs = 2L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map("a" -> ((10L, 20L)), "b" -> ((100L, 200L)), "c" -> ((1000L, 280L))), out.toString)
    // allocations never exceed the total
    assert(out.values.map(_._2).sum <= 500L)
    // ties in token count order by group name: equal-size groups still
    // produce a deterministic (identical-share) allocation
    val tied = Seq(("x", 10L), ("y", 10L)).toDF("g", "nt")
    val t2 = Sampling.unimaxBudgets(tied, "g", col("nt"), 10L, 5L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(t2 == Map("x" -> 5L, "y" -> 5L), t2.toString)
    intercept[IllegalArgumentException] {
      Sampling.unimaxBudgets(d, "g", col("nt"), 0L, 2L)
    }
    intercept[IllegalArgumentException] {
      Sampling.unimaxBudgets(d, "g", col("nt"), 10L, 0L)
    }
  }

  test("tokenQuotaPerGroupBudgets: per-group caps, absent groups drop, matches single-budget form") {
    import graft.operators.Sampling
    val d = Seq(
      ("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 100L),
      ("b", 4L, 100L), ("b", 5L, 100L), ("b", 6L, 100L),
      ("c", 7L, 100L) // absent from the budget map → drops
    ).toDF("g", "id", "nt")
    val got = Sampling.tokenQuotaPerGroupBudgets(d, "id", "g", col("nt"),
        Map("a" -> 250L, "b" -> 100L))
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._2 -> r._5).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false,
      4L -> true, 5L -> false, 6L -> false), got.toString)
    // a uniform budget map reproduces the single-budget operator exactly
    val uni = Sampling.tokenQuotaPerGroupBudgets(d, "id", "g", col("nt"),
        Map("a" -> 250L, "b" -> 250L, "c" -> 250L))
      .as[(String, Long, Long, Long, Boolean)].collect().toSet
    val ref = Sampling.tokenQuotaPerGroup(d, "id", "g", col("nt"), 250L)
      .as[(String, Long, Long, Long, Boolean)].collect().toSet
    assert(uni == ref, s"uni=$uni ref=$ref")
    // zero budget keeps nothing from its group but is legal
    val z = Sampling.tokenQuotaPerGroupBudgets(d, "id", "g", col("nt"),
        Map("a" -> 0L))
      .filter(col("keep")).count()
    assert(z == 0L)
    intercept[IllegalArgumentException] {
      Sampling.tokenQuotaPerGroupBudgets(d, "id", "g", col("nt"), Map.empty)
    }
  }

  test("negativeSamples: per-anchor independence, self-exclusion, determinism, k cut") {
    import spark.implicits._
    val pool = spark.range(200).select(col("id").cast("string").as("c"))
    val anchors = Seq("3", "7", "11").toDF("a")
    val got = Sampling.negativeSamples(anchors, "a", pool, "c", k = 8)
      .as[(String, String, Int)].collect()
    val byAnchor = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byAnchor.keySet == Set("3", "7", "11"))
    assert(byAnchor.values.forall(_.size == 8))
    // self never appears among its own negatives
    assert(byAnchor.forall { case (a, negs) => !negs.contains(a) })
    // the pair hash makes the draws independent: not all sets equal
    assert(byAnchor.values.toSet.size > 1, byAnchor.toString)
    // deterministic across re-evaluation and repartition
    val again = Sampling.negativeSamples(anchors, "a",
        pool.repartition(7), "c", k = 8)
      .as[(String, String, Int)].collect().toSet
    assert(again == got.toSet)
    // a different salt draws a different epoch
    val salted = Sampling.negativeSamples(anchors, "a", pool, "c", 8, "neg2")
      .as[(String, String, Int)].collect().toSet
    assert(salted != got.toSet)
    intercept[IllegalArgumentException] {
      Sampling.negativeSamples(anchors, "a", pool, "c", 0)
    }
  }

  test("temporalSplit: boundary semantics, explicit gap label, null time, inverted bounds refused") {
    import spark.implicits._
    val d = Seq(Some(9L), Some(10L), Some(12L), Some(13L), Some(20L), None)
      .toDF("t")
    val got = Sampling.temporalSplit(d, col("t"), 10L, 13L)
      .as[(Option[Long], Option[String])].collect().toMap
    assert(got(Some(9L)).contains("train"))   // strictly before trainEnd
    assert(got(Some(10L)).contains("gap"))    // trainEnd itself is OUT of train
    assert(got(Some(12L)).contains("gap"))
    assert(got(Some(13L)).contains("test"))   // testStart inclusive
    assert(got(Some(20L)).contains("test"))
    assert(got(None).isEmpty)                 // null time → null label
    // zero-width gap is legal (trainEnd == testStart): nothing labels gap
    val z = Sampling.temporalSplit(d, col("t"), 13L, 13L)
      .filter(col("split") === "gap").count()
    assert(z == 0L)
    intercept[IllegalArgumentException] {
      Sampling.temporalSplit(d, col("t"), 13L, 10L)
    }
  }

  test("curriculumOrder: permutation, bands contiguous easy→hard, within-band hash order, layout-stable") {
    import org.apache.spark.sql.graft.ColumnBridge
    // score = id → band thresholds are the exact quartiles of 0..399
    val df = spark.range(0, 400).toDF("id").withColumn("score", $"id")
    val out = Sampling.curriculumOrder(df, "id", "score", nBands = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    // pos is exactly 1..n
    assert(out.map(_._3).toSeq == (1L to 400L))
    // bands are ascending blocks in pos order (easy first), all 4 present
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq)
    assert(out.map(_._2).distinct.toSeq == Seq(0L, 1L, 2L, 3L))
    // within a band, order follows (signed FNV hash, id) — brute force one band
    val h = ColumnBridge.column(graft.plans.FnvHash64(
      ColumnBridge.expression(concat(lit("curr:"), $"id".cast("string")))))
    val hashes = df.withColumn("_h", h).select("id", "_h")
      .as[(Long, Long)].collect().toMap
    val band0 = out.filter(_._2 == 0L).map(_._1).toSeq
    assert(band0 == band0.sortBy(id => (hashes(id), id)))
    // band membership is the exact quantile cut, not a hash artifact:
    // band 0 holds the lowest quartile of scores
    assert(band0.toSet == (0L until 100L).toSet, band0.sorted.take(5).toString)
    // re-partitioning must not change the schedule
    val again = Sampling.curriculumOrder(df.repartition(7), "id", "score", 4)
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(again.toSeq == out.toSeq)
    // null scores drop; nBands < 2 refused
    val withNull = df.withColumn("score",
      when($"id" === 5L, lit(null)).otherwise($"score"))
    assert(Sampling.curriculumOrder(withNull, "id", "score", 4).count() == 399L)
    intercept[IllegalArgumentException] {
      Sampling.curriculumOrder(df, "id", "score", 1)
    }
  }
}
