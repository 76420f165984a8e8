package graft

import graft.operators.Annotation
import org.apache.spark.sql.functions._

class AnnotationSpec extends SparkSpec {
  import spark.implicits._

  test("consensusLabels: majority wins, ties to the smaller label, exact vote share, nulls drop") {
    val r = Seq(
      ("u1", "x"), ("u1", "x"), ("u1", "y"),       // majority x, 2/3
      ("u2", "b"), ("u2", "a"),                    // tie → a
      ("u3", "z"),                                 // singleton unit keeps its label
      ("u4", null), (null, "q")                    // null unit/label drop
    ).toDF("unit", "label")
    val got = Annotation.consensusLabels(r, "unit", "label")
      .as[(String, String, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(got == Map(
      "u1" -> (("x", 3L, 666666L)),
      "u2" -> (("a", 2L, 500000L)),
      "u3" -> (("z", 1L, 1000000L))), got.toString)
  }

  test("krippendorffAlphaNominalE6: perfect agreement = 1e6; single split unit = 0; hand-replayed mixed case; degenerates") {
    // perfect: two units, internally unanimous, different labels
    val perfect = Seq(("u1", "x"), ("u1", "x"), ("u2", "y"), ("u2", "y"))
      .toDF("u", "l")
    val p = Annotation.krippendorffAlphaNominalE6(perfect, "u", "l")
      .as[(Long, Long, Long, Long)].collect().head
    assert(p == ((2L, 4L, 0L, 1000000L)), p.toString)
    // one unit, two raters, split: alpha = 0 (chance level)
    val split = Seq(("u1", "x"), ("u1", "y")).toDF("u", "l")
    val s0 = Annotation.krippendorffAlphaNominalE6(split, "u", "l")
      .as[(Long, Long, Long, Long)].collect().head
    assert(s0 == ((1L, 2L, 2000000L, 0L)), s0.toString)
    // mixed, replayed by hand:
    //   u1: {x:2}         m=2, d = 4−4 = 0      → do6 += 0
    //   u2: {x:1, y:2}    m=3, d = 9−5 = 4      → do6 += 4e6 div 2 = 2e6
    //   u3: {y:1}         m=1 → dropped (label never enters marginals)
    // n = 5, n_x = 3, n_y = 2, denom = 25 − 9 − 4 = 12
    // alpha_ppm = 1e6 − (2e6 · 4) div 12 = 1e6 − 666666 = 333334
    val mixed = Seq(("u1", "x"), ("u1", "x"),
      ("u2", "x"), ("u2", "y"), ("u2", "y"), ("u3", "y")).toDF("u", "l")
    val m = Annotation.krippendorffAlphaNominalE6(mixed, "u", "l")
      .as[(Long, Long, Long, Long)].collect().head
    assert(m == ((2L, 5L, 2000000L, 333334L)), m.toString)
    // all kept ratings one label: De = 0 → alpha undefined → empty
    val flat = Seq(("u1", "x"), ("u1", "x"), ("u2", "x"), ("u2", "x"))
      .toDF("u", "l")
    assert(Annotation.krippendorffAlphaNominalE6(flat, "u", "l").count() == 0L)
    // only singleton units: no agreement information at all → empty
    val singles = Seq(("u1", "x"), ("u2", "y")).toDF("u", "l")
    assert(Annotation.krippendorffAlphaNominalE6(singles, "u", "l")
      .count() == 0L)
  }

  test("krippendorffAlphaIntervalE6: near-misses score higher than the nominal form; hand-replayed; tripwires") {
    // two units: (1,2) and (4,5) — nominal sees total disagreement,
    // interval sees near-misses against a wide spread.
    //   u1: m=2 S1=3  S2=5  → do6 = 2(10−9)·1e6 div 1 = 2e6
    //   u2: m=2 S1=9  S2=41 → do6 = 2(82−81)·1e6 div 1 = 2e6
    //   n=4 T1=12 T2=46, De-denom = 2(184−144) = 80
    //   alpha_ppm = 1e6 − (4e6·3) div 80 = 1e6 − 150000 = 850000
    val near = Seq(("u1", 1L), ("u1", 2L), ("u2", 4L), ("u2", 5L))
      .toDF("u", "v")
    val got = Annotation.krippendorffAlphaIntervalE6(near, "u", "v")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((2L, 4L, 4000000L, 850000L)), got.toString)
    val nom = Annotation.krippendorffAlphaNominalE6(near, "u", "v")
      .select("alpha_ppm").as[Long].collect().head
    // nominal: every within-unit pair disagrees → chance level (0);
    // interval credits the near-misses → 850000
    assert(nom == 0L && nom < got._4, s"nominal $nom vs interval ${got._4}")
    // perfect agreement = 1e6; constant corpus (De = 0) emits nothing
    val perfect = Seq(("u1", 3L), ("u1", 3L), ("u2", 7L), ("u2", 7L))
      .toDF("u", "v")
    assert(Annotation.krippendorffAlphaIntervalE6(perfect, "u", "v")
      .select("alpha_ppm").as[Long].collect().head == 1000000L)
    val const = Seq(("u1", 3L), ("u1", 3L)).toDF("u", "v")
    assert(Annotation.krippendorffAlphaIntervalE6(const, "u", "v")
      .count() == 0L)
    // |v| > 1e3 refuses loudly
    val wide = Seq(("u1", 5000L), ("u1", 2L)).toDF("u", "v")
    val e = intercept[Exception](
      Annotation.krippendorffAlphaIntervalE6(wide, "u", "v").collect())
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("10^3"), e.toString)
  }

  test("krippendorffAlphaIntervalE6: max-spread wide unit inside the tripwire domain computes exactly (e6 scaling widened to decimal)") {
    // one unit, 4000 ratings at the +/-10^3 boundary: the per-unit
    // 2*(m*S2 - S1^2)*10^6 = 3.2e19 exceeds int64 — the pre-fix pure
    // int64 expression died here under ANSI despite being inside the
    // documented |v| <= 10^3, m <= 10^6 domain. Hand-replayed:
    //   m=4000 S1=0 S2=4e9 → do6 = 3.2e19 div 3999 = 8002000500125031
    //   denom = 2*(4000*4e9) = 3.2e13 → alpha_ppm = 1e6 - do6*3999 div denom = 1
    val wideUnit = spark.range(4000)
      .select(lit("u").as("u"),
        (when(col("id") % 2 === 0, 1000L).otherwise(-1000L)).as("v"))
    val got = Annotation.krippendorffAlphaIntervalE6(wideUnit, "u", "v")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((1L, 4000L, 8002000500125031L, 1L)), got.toString)
  }

  test("raterReliability: perfect rater = 1e6, planted bad rater surfaces with negative kappa, degenerate rater = null kappa") {
    // u1: x,x,y(+bad y) → consensus x (tie x2/y2 → lexicographic x)
    // u2: y,y,y,y(+bad x) → consensus y;  u3: x,y,x(+bad y) → x
    // hand-replayed: r1 agrees everywhere (kappa 1e6); r2/r3 miss one
    // each (po 666666, S=4, kappa = 1e6 − 3·1·1e6 div 5 = 400000);
    // r4 rates one unit, label == consensus == their only label → p_e=1
    // → kappa NULL; r5 (the planted bad rater) misses everything
    // (po 0, kappa = 1e6 − 9e6 div 5 = −800000)
    val r = Seq(
      ("u1", "r1", "x"), ("u1", "r2", "x"), ("u1", "r3", "y"),
      ("u2", "r1", "y"), ("u2", "r2", "y"), ("u2", "r3", "y"),
      ("u3", "r1", "x"), ("u3", "r2", "y"), ("u3", "r3", "x"),
      ("u2", "r4", "y"),
      ("u1", "r5", "y"), ("u2", "r5", "x"), ("u3", "r5", "y")
    ).toDF("unit", "rater", "label")
    val got = Annotation.raterReliability(r, "unit", "rater", "label")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3),
          if (x.isNullAt(4)) None else Some(x.getLong(4))))).toMap
    assert(got == Map(
      "r1" -> ((3L, 3L, 1000000L, Some(1000000L))),
      "r2" -> ((3L, 2L, 666666L, Some(400000L))),
      "r3" -> ((3L, 2L, 666666L, Some(400000L))),
      "r4" -> ((1L, 1L, 1000000L, None)),
      "r5" -> ((3L, 0L, 0L, Some(-800000L)))), got.toString)
    // the planted bad rater is the unique minimum
    assert(got.collect { case (k, (_, _, _, Some(v))) => k -> v }
      .minBy(_._2)._1 == "r5")
  }

  test("krippendorffAlphaOrdinalE6: hand-replayed; near-miss corpus scores HIGHER than nominal; degenerates; distinct-value cap") {
    // scale 1..3, disagreements all adjacent-rank near-misses:
    //   u1 {1,2}, u2 {2,3}, u3 {2,2}
    // marginals n1=1 n2=4 n3=1, D(1,2)=5 D(2,3)=5 D(1,3)=10
    //   u1: do6 = 1·1·25·2e6 div 1 = 5e7; u2: 5e7; u3: 0 → doE6 = 1e8
    //   deNum = 2(1·4·25 + 1·1·100 + 4·1·25) = 600
    //   alpha = 1e6 − 1e8·5 div 600 = 166667
    val near = Seq(("u1", 1L), ("u1", 2L), ("u2", 2L), ("u2", 3L),
      ("u3", 2L), ("u3", 2L)).toDF("u", "v")
    val ord = Annotation.krippendorffAlphaOrdinalE6(near, "u", "v")
      .as[(Long, Long, Long, Long)].collect().head
    assert(ord == ((3L, 6L, 100000000L, 166667L)), ord.toString)
    // nominal on the same data: do6 = 4e6, denom = 36−18 = 18
    //   alpha = 1e6 − 4e6·5 div 18 = −111111 — the ordinal form
    //   credits near-misses the nominal form cannot see
    val nom = Annotation.krippendorffAlphaNominalE6(near, "u", "v")
      .select("alpha_ppm").as[Long].collect().head
    assert(nom == -111111L && ord._4 > nom, s"nominal $nom ordinal ${ord._4}")
    // perfect agreement = 1e6; constant corpus emits nothing
    val perfect = Seq(("u1", 2L), ("u1", 2L), ("u2", 3L), ("u2", 3L))
      .toDF("u", "v")
    assert(Annotation.krippendorffAlphaOrdinalE6(perfect, "u", "v")
      .select("alpha_ppm").as[Long].collect().head == 1000000L)
    val const = Seq(("u1", 3L), ("u1", 3L)).toDF("u", "v")
    assert(Annotation.krippendorffAlphaOrdinalE6(const, "u", "v").count() == 0L)
    // only singleton units → empty
    val singles = Seq(("u1", 1L), ("u2", 2L)).toDF("u", "v")
    assert(Annotation.krippendorffAlphaOrdinalE6(singles, "u", "v")
      .count() == 0L)
    // a measurement-like column (too many distinct ranks) refuses loudly
    val wide = spark.range(40)
      .select((col("id") % 20).cast("string").as("u"), col("id").as("v"))
    val e = intercept[IllegalArgumentException](
      Annotation.krippendorffAlphaOrdinalE6(wide, "u", "v", maxDistinct = 16))
    assert(e.getMessage.contains("ordinal scale"), e.getMessage)
  }

  test("applyAnnotationBatch: stream ≡ batch on the concatenated log for consensus AND alpha; additive count state; replay + torn commit") {
    import graft.streaming.StreamingOps
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val b0 = Seq(("u1", "x"), ("u1", "x"), ("u2", "y")).toDF("unit", "label")
    val b1 = Seq(("u1", "y"), ("u2", "y"), ("u2", "x"), ("u3", "x"))
      .toDF("unit", "label")
    val all = b0.unionByName(b1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-spec").toString
    def step(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingOps.applyAnnotationBatch(spark, b, id, "unit", "label",
        s"$dir/state", s"$dir/out")
    step(b0, 0L)
    assert(rows(spark.read.parquet(s"$dir/out/consensus/batch=0")) ==
      rows(Annotation.consensusLabels(b0, "unit", "label")))
    assert(rows(spark.read.parquet(s"$dir/out/alpha/batch=0")) ==
      rows(Annotation.krippendorffAlphaNominalE6(b0, "unit", "label")))
    step(b1, 1L)
    val c1 = rows(spark.read.parquet(s"$dir/out/consensus/batch=1"))
    val a1 = rows(spark.read.parquet(s"$dir/out/alpha/batch=1"))
    // the accumulated outputs equal the batch operators on the full log
    assert(c1 == rows(Annotation.consensusLabels(all, "unit", "label")))
    assert(a1 == rows(
      Annotation.krippendorffAlphaNominalE6(all, "unit", "label")))
    // state holds additive (unit, label) counts, never raw rating rows
    val st = StreamingOps.readState(spark, s"$dir/state").get
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(st(("u1", "x")) == 2L && st(("u1", "y")) == 1L &&
      st(("u2", "y")) == 2L && st(("u2", "x")) == 1L && st(("u3", "x")) == 1L)
    // replay no-ops; torn commit recomputes bit-identically
    step(b1, 1L)
    assert(StreamingOps.currentVersionId(spark, s"$dir/state").contains(1L))
    assert(rows(spark.read.parquet(s"$dir/out/alpha/batch=1")) == a1)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$dir/state/_CURRENT"), true)
    try out.write("v0".getBytes("UTF-8")) finally out.close()
    step(b1, 1L)
    assert(StreamingOps.currentVersionId(spark, s"$dir/state").contains(1L))
    assert(rows(spark.read.parquet(s"$dir/out/consensus/batch=1")) == c1)
  }

  test("applyRaterBatch: stream ≡ batch rater reliability on the concatenated log; additive (u,r,l) state; replay no-op") {
    import graft.streaming.StreamingOps
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val b0 = Seq(("u1", "r1", "x"), ("u1", "r2", "x"), ("u2", "r1", "y"))
      .toDF("unit", "rater", "label")
    val b1 = Seq(("u1", "r3", "y"), ("u2", "r2", "y"), ("u2", "r3", "y"),
      ("u3", "r1", "x"), ("u3", "r3", "x")).toDF("unit", "rater", "label")
    val all = b0.unionByName(b1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-rater-spec").toString
    def step(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingOps.applyRaterBatch(spark, b, id, "unit", "rater", "label",
        s"$dir/state", s"$dir/out")
    step(b0, 0L)
    assert(rows(spark.read.parquet(s"$dir/out/batch=0")) ==
      rows(Annotation.raterReliability(b0, "unit", "rater", "label")))
    step(b1, 1L)
    val r1 = rows(spark.read.parquet(s"$dir/out/batch=1"))
    assert(r1 ==
      rows(Annotation.raterReliability(all, "unit", "rater", "label")))
    // additive fine-grained counts, never raw rows
    val st = StreamingOps.readState(spark, s"$dir/state").get
      .as[(String, String, String, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(st(("u1", "r1", "x")) == 1L && st(("u2", "r3", "y")) == 1L &&
      st.size == 8)
    // replay no-ops
    step(b1, 1L)
    assert(StreamingOps.currentVersionId(spark, s"$dir/state").contains(1L))
    assert(rows(spark.read.parquet(s"$dir/out/batch=1")) == r1)
  }

  test("krippendorffAlphaNominalE6: a unit past 3e6 ratings refuses loudly (the (m^2-ss)*1e6 int64 bound)") {
    val huge = spark.range(3000001)
      .select(lit("u").as("u"), (col("id") % 2).cast("string").as("l"))
    val e = intercept[Exception](
      Annotation.krippendorffAlphaNominalE6(huge, "u", "l").collect())
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("3*10^6"), e.toString)
  }
}
