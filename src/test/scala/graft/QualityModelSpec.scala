package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityModel

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private val B = QualityModel.DefaultBuckets
  private def dec(s: String) = new java.math.BigDecimal(s)

  test("scoreMargin: exact integer dot + bias (×10⁶); empty/null docs keep the bias; broadcast join") {
    // uniform weights make the margin hand-computable without knowing
    // the hash: bias + 0.5 · token_count, as margin_e6 = (…)×10⁶
    val w = IndexedSeq.fill(B)(dec("0.500000"))
    val docs = Seq(
      (1L, "alpha beta gamma"),     // 3 tokens -> 0.25 + 1.5
      (2L, "  alpha  "),            // 1 token  -> 0.25 + 0.5
      (3L, ""),                     // 0 tokens -> bias exactly
      (4L, null.asInstanceOf[String]) // null text -> bias too
    ).toDF("doc_id", "text")
    val got = QualityModel.scoreMargin(docs, "doc_id", "text", w, dec("0.250000"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1750000L, 2L -> 750000L, 3L -> 250000L, 4L -> 250000L))
    // weight sign flows through: a negative table scores below bias
    val neg = QualityModel.scoreMargin(docs, "doc_id", "text",
        IndexedSeq.fill(B)(dec("-1.000000")), dec("0.000000"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(neg(1L) == -3000000L && neg(3L) == 0L)
    // plan: the weight table joins BROADCAST and tokens never shuffle —
    // every exchange carries (id, bucket) feature rows at most
    val plan = QualityModel.scoreMargin(docs, "doc_id", "text", w, dec("0"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    val exchanges = plan.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.forall(l => !l.contains("token#")), plan)
  }

  test("trainLogistic: MLlib fit separates a planted signal; quantized serving margins track rawPrediction") {
    // planted vocabulary: "good" docs carry quality tokens, "bad" docs
    // carry spam tokens — linearly separable by construction
    val goodWords = Seq("insight", "thorough", "evidence", "careful")
    val badWords = Seq("clickbait", "spamspam", "scamword", "junktext")
    val rng = new scala.util.Random(7)
    val docs = (0 until 200).map { i =>
      val vocab = if (i % 2 == 0) goodWords else badWords
      val text = Seq.fill(8)(vocab(rng.nextInt(vocab.length))).mkString(" ")
      (i.toLong, text, if (i % 2 == 0) 1.0 else 0.0)
    }
    val df = docs.map(d => (d._1, d._2)).toDF("doc_id", "text")
    val labels = docs.map(d => (d._1, d._3)).toDF("doc_id", "label")
    val (w, b) = QualityModel.trainLogistic(df, "doc_id", "text", labels)
    assert(w.length == B)
    // serving margins vs a direct in-JVM replay of the same features:
    // quantization moves each weight < 0.5e-6, docs have 8 tokens, so
    // the served margin sits within 8 * 0.5e-6 + 0.5e-6 of the float one
    val margins = QualityModel.scoreMargin(df, "doc_id", "text", w, b)
      .collect().map(r => r.getLong(0) -> r.getLong(1) / 1e6).toMap
    // the classifier separates: every good doc above every bad doc
    val goodMin = docs.filter(_._3 == 1.0).map(d => margins(d._1)).min
    val badMax = docs.filter(_._3 == 0.0).map(d => margins(d._1)).max
    assert(goodMin > badMax,
      s"margins must separate the planted signal: goodMin=$goodMin badMax=$badMax")
    // and the sigmoid face thresholds at 0.5 where the margin is 0
    val probs = QualityModel.scoreProbability(df, "doc_id", "text", w, b)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    docs.foreach { d =>
      assert((probs(d._1) > 0.5) == (margins(d._1) > 0.0), s"doc ${d._1}")
    }
  }

  test("calibrationBuckets: hand-computed buckets, exact ECE, edge probs, tripwires") {
    // bucket 1: probs 100000/150000 both labeled 0 → mean 125000, rate 0
    // bucket 9: probs 950000 (y=1) and the p=10^6 edge (y=1) → mean
    // 975000, rate 10^6, gap 25000
    val rows = Seq((100000L, 0L), (150000L, 0L), (950000L, 1L), (1000000L, 1L))
      .toDF("prob_ppm", "label")
    val got = QualityModel.calibrationBuckets(rows, "prob_ppm", "label")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    // ECE = (2·125000 + 2·25000) div 4 = 75000
    assert(got == Map(
      1L -> ((2L, 0L, 125000L, 0L, 125000L, 75000L)),
      9L -> ((2L, 2L, 975000L, 1000000L, 25000L, 75000L))), got.toString)
    // a perfectly calibrated bucket has gap 0 (2 of 4 positive at p=0.5)
    val perfect = Seq((500000L, 1L), (500000L, 0L), (500000L, 1L),
      (500000L, 0L)).toDF("prob_ppm", "label")
    val g2 = QualityModel.calibrationBuckets(perfect, "prob_ppm", "label")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(g2.length == 1 && g2.head._6 == 0L && g2.head._7 == 0L,
      g2.mkString(","))
    // out-of-range prob / non-binary label refuse loudly
    for (bad <- Seq((1000001L, 1L), (-1L, 0L), (500000L, 2L))) {
      val e = intercept[Exception] {
        QualityModel.calibrationBuckets(Seq(bad).toDF("prob_ppm", "label"),
          "prob_ppm", "label").collect()
      }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains("prob_ppm must be in"), e.toString)
    }
    intercept[IllegalArgumentException](
      QualityModel.calibrationBuckets(rows, "prob_ppm", "label", buckets = 1))
    intercept[IllegalArgumentException](
      QualityModel.calibrationBuckets(rows, "prob_ppm", "label", buckets = 1001))
  }

  test("calibrationBucketsQuantile: equal-mass edges resolve a skewed pile-up; stats and ECE keep their meaning") {
    // a skewed score pile: 8 examples in [0, 0.08], 2 near 1.0 —
    // equal-width deciles dump 8 of 10 examples into bucket 0
    val skew = Seq(
      (10000L, 0L), (20000L, 0L), (30000L, 0L), (40000L, 0L),
      (50000L, 1L), (60000L, 0L), (70000L, 0L), (80000L, 0L),
      (950000L, 1L), (990000L, 1L)).toDF("prob_ppm", "label")
    val widthMax = QualityModel.calibrationBuckets(skew, "prob_ppm", "label",
        buckets = 5)
      .agg(max(col("n"))).as[Long].collect().head
    assert(widthMax == 8L, widthMax.toString) // the blindness being fixed
    val got = QualityModel.calibrationBucketsQuantile(skew, "prob_ppm",
        "label", buckets = 5)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    // equal-mass: every bucket holds 2 of the 10 examples
    assert(got.map(_._2).toSeq == Seq(2L, 2L, 2L, 2L, 2L),
      got.mkString(","))
    // the pile-up is resolved across 5 buckets, and the top bucket
    // isolates the two confident positives exactly
    val top = got.last
    assert(top._3 == 2L && top._5 == 1000000L && top._4 == 970000L,
      top.toString)
    // ECE = Σ n_b·gap_b div N, identical fold to the equal-width form
    val eceExpected = got.map(r => r._2 * r._6).sum / got.map(_._2).sum
    assert(got.forall(_._7 == eceExpected), got.mkString(","))
    // same tripwire as the equal-width form
    val e = intercept[Exception] {
      QualityModel.calibrationBucketsQuantile(
        Seq((1000001L, 1L)).toDF("prob_ppm", "label"),
        "prob_ppm", "label").collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("prob_ppm must be in"), e.toString)
  }

  test("applyCalibrationBatch: stream ≡ batch on concatenated examples; replay no-op; torn commit converges") {
    import graft.streaming.StreamingOps
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("bucket").collect().map(_.toSeq).toSeq
    val b0 = Seq((100000L, 0L), (950000L, 1L)).toDF("prob_ppm", "label")
    val b1 = Seq((150000L, 0L), (1000000L, 1L), (500000L, 1L))
      .toDF("prob_ppm", "label")
    val all = b0.unionByName(b1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-calib-spec").toString
    def step(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingOps.applyCalibrationBatch(spark, b, id, "prob_ppm", "label",
        buckets = 10, s"$dir/state", s"$dir/out")
    step(b0, 0L)
    assert(rows(spark.read.parquet(s"$dir/out/batch=0")) ==
      rows(QualityModel.calibrationBuckets(b0, "prob_ppm", "label")))
    step(b1, 1L)
    val r1 = rows(spark.read.parquet(s"$dir/out/batch=1"))
    assert(r1 == rows(QualityModel.calibrationBuckets(all, "prob_ppm", "label")))
    // state is ≤buckets rows of additive stats, never examples
    assert(StreamingOps.readState(spark, s"$dir/state").get.count() <= 10L)
    // replay no-op; torn commit recomputes bit-identically
    step(b1, 1L)
    assert(StreamingOps.currentVersionId(spark, s"$dir/state").contains(1L))
    assert(rows(spark.read.parquet(s"$dir/out/batch=1")) == r1)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$dir/state/_CURRENT"), true)
    try out.write("v0".getBytes("UTF-8")) finally out.close()
    step(b1, 1L)
    assert(StreamingOps.currentVersionId(spark, s"$dir/state").contains(1L))
    assert(rows(spark.read.parquet(s"$dir/out/batch=1")) == r1)
  }

  test("temperatureScaleE6: overconfident margins choose the largest T; exact ties fall to the smallest T; tripwires") {
    val grid = Seq(250000L, 1000000L, 5000000L)
    // overconfident: extreme margins, 50% actual rate on each side —
    // flattening toward 0.5 strictly reduces ECE, so T = 5.0 must win
    val over = ((0 until 20).map(i => (5000000L, (i % 2).toLong)) ++
      (0 until 20).map(i => (-5000000L, (i % 2).toLong)))
      .toDF("margin_e6", "label")
    val got = QualityModel.temperatureScaleE6(over, "margin_e6", "label", grid)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.count(_._3) == 1 && got.find(_._3).get._1 == 5000000L,
      got.mkString(","))
    // margin 0 everywhere: sigma(0/T) = 0.5 for every T — an exact ECE
    // tie, which must fall DETERMINISTICALLY to the smallest T
    val flat = (0 until 10).map(i => (0L, (i % 2).toLong))
      .toDF("margin_e6", "label")
    val tied = QualityModel.temperatureScaleE6(flat, "margin_e6", "label", grid)
      .as[(Long, Long, Boolean)].collect()
    assert(tied.map(_._2).distinct.length == 1 &&
      tied.count(_._3) == 1 && tied.find(_._3).get._1 == 250000L,
      tied.mkString(","))
    // label outside 0/1 refuses loudly
    val bad = Seq((0L, 2L)).toDF("margin_e6", "label")
    val e = intercept[Exception](QualityModel.temperatureScaleE6(
      bad, "margin_e6", "label", grid).collect())
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("0/1"), e.toString)
    // duplicate grid refuses
    intercept[IllegalArgumentException](QualityModel.temperatureScaleE6(
      flat, "margin_e6", "label", Seq(1L, 1L)))
  }

  test("trainLogisticEpochsE6: separates a planted vocabulary; deterministic across runs; bias learns a skewed base rate; label tripwire") {
    // positive docs say "good", negative docs say "bad" — after a few
    // epochs the trained weights must rank every positive above every
    // negative through the UNCHANGED serving path
    val docs = (0 until 24).map { i =>
      if (i % 2 == 0) (i.toLong, "good text sample body")
      else (i.toLong, "bad text sample body")
    }.toDF("id", "text")
    val labels = docs.select(col("id"), (col("id") % 2 === 0).cast("long").as("label"))
    val (w, bias) = QualityModel.trainLogisticEpochsE6(docs, "id", "text",
      labels, "label", epochs = 4, lrPpm = 300000L)
    val margins = QualityModel.scoreMargin(docs, "id", "text",
        w.map(v => java.math.BigDecimal.valueOf(v, 6)),
        java.math.BigDecimal.valueOf(bias, 6))
      .as[(Long, Long)].collect().toMap
    val pos = (0 until 24 by 2).map(i => margins(i.toLong))
    val neg = (1 until 24 by 2).map(i => margins(i.toLong))
    assert(pos.min > neg.max,
      s"positives ${pos.min} must outrank negatives ${neg.max}")
    // bit-identical across runs (the whole point vs the MLlib path)
    val (w2, bias2) = QualityModel.trainLogisticEpochsE6(docs, "id", "text",
      labels, "label", epochs = 4, lrPpm = 300000L)
    assert(w == w2 && bias == bias2)
    // all-positive corpus: shared tokens and bias must drift positive
    // (token-less docs would still train the bias through bucket -1)
    val onesided = (0 until 8).map(i => (i.toLong, "steady words here"))
      .toDF("id", "text")
    val oneLab = onesided.select(col("id"), lit(1L).as("label"))
    val (_, b1s) = QualityModel.trainLogisticEpochsE6(onesided, "id",
      "text", oneLab, "label", epochs = 2, lrPpm = 300000L)
    assert(b1s > 0L, s"bias should drift positive, got $b1s")
    // a non-0/1 label refuses loudly
    val badLab = onesided.select(col("id"), lit(2L).as("label"))
    val e = intercept[Exception](QualityModel.trainLogisticEpochsE6(
      onesided, "id", "text", badLab, "label", epochs = 1, lrPpm = 1000L))
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("0/1"), e.toString)
  }
}
