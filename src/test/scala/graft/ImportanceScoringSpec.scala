package graft

import org.apache.spark.sql.functions._
import graft.operators.ImportanceScoring

class ImportanceScoringSpec extends SparkSpec {
  import spark.implicits._

  test("dsir scores rank target-like docs above off-target docs") {
    val target = Seq.tabulate(20)(i =>
      (i.toLong, "spark shuffle partition join scan")).toDF("id", "text")
    val offTopic = Seq.tabulate(20)(i =>
      ((100 + i).toLong, "cat dog fish bird mouse")).toDF("id", "text")
    val raw = target.union(offTopic)
    val w = ImportanceScoring.importanceWeights(target, raw, "text", buckets = 256)
    // one weight per bucket, none null (add-one smoothing covers misses)
    assert(w.count() == 256)
    assert(w.filter(col("weight_e6").isNull).count() == 0)
    val scored = ImportanceScoring.scoreDocs(raw, "id", "text", w, buckets = 256)
      .as[(Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(scored.size == 40)
    // target vocabulary scores positive (more likely under target than
    // raw), off-topic vocabulary negative — the resampling signal
    assert(scored(0L) > 0, s"target doc score ${scored(0L)}")
    assert(scored(100L) < 0, s"off-topic doc score ${scored(100L)}")
    assert(scored(0L) > scored(100L))
    // scoring joins the bucket table BROADCAST — token rows never shuffle
    // for the join (the per-doc sum's partial agg is the only exchange)
    val plan = ImportanceScoring.scoreDocs(raw, "id", "text", w, buckets = 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop") ||
      plan.contains("broadcast"), plan)
  }

  test("empty target corpus still yields finite smoothed weights") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val raw = Seq((1L, "a b c")).toDF("id", "text")
    val w = ImportanceScoring.importanceWeights(empty, raw, "text", buckets = 64)
    assert(w.count() == 64)
    assert(w.filter(col("weight_e6").isNull).count() == 0)
  }

  test("bigram LM: target-like transitions outscore scrambled and off-target docs") {
    val target = Seq.tabulate(20)(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val docs = Seq(
      (100L, "the quick brown fox jumps"),     // target word ORDER
      (101L, "fox the jumps quick brown"),     // same words, scrambled transitions
      (102L, "zq xv jk wp mn"),                // off-vocabulary entirely
      (103L, "solo")                           // < 2 tokens: no row
    ).toDF("id", "text")
    val out = ImportanceScoring.lmScoreDocs(docs, "id", "text", target, "text")
      .select("id", "n_bigrams", "mean_logp")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(100L)._1 == 4L)
    assert(out(100L)._2 > out(101L)._2, s"order must matter: $out")
    assert(out(100L)._2 > out(102L)._2, s"target transitions beat off-vocab: $out")
    assert(!out.contains(103L))
    // deterministic: same inputs, same scores
    val again = ImportanceScoring.lmScoreDocs(docs, "id", "text", target, "text")
      .select("id", "mean_logp").as[(Long, Double)].collect().toMap
    assert(out.forall { case (id, (_, m)) => again(id) == m })
  }

  test("buckets must be a power of two") {
    intercept[IllegalArgumentException] {
      ImportanceScoring.tokenBucket(lit("x"), 100, "dsir")
    }
  }

  test("importanceWeightLiterals ≡ engine-ln importanceWeights, bit for bit") {
    // the gate-portability contract: the driver-computed weight table
    // (JVM ln over collected exact histograms) reproduces the
    // engine-side table value-for-value, so scoreDocs over the literal
    // table is a drop-in for the ln path
    val target = Seq.tabulate(10)(i =>
      (i.toLong, "spark shuffle partition join")).toDF("id", "text")
    val raw = target.union(Seq.tabulate(10)(i =>
      ((100 + i).toLong, "cat dog fish bird")).toDF("id", "text"))
    val lits = ImportanceScoring.importanceWeightLiterals(target, raw, "text",
      buckets = 256)
    assert(lits.size == 256 && lits.forall(_.scale == 6))
    val engine = ImportanceScoring.importanceWeights(target, raw, "text",
        buckets = 256)
      .as[(Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert((0 until 256).forall(b =>
      engine(b.toLong) == lits(b).movePointRight(6).longValueExact()))
    val viaLit = ImportanceScoring.scoreDocs(raw, "id", "text",
        ImportanceScoring.weightsTableFromLiterals(spark, lits), buckets = 256)
      .as[(Long, Long)].collect().toSet
    val viaLn = ImportanceScoring.scoreDocs(raw, "id", "text",
        ImportanceScoring.importanceWeights(target, raw, "text", buckets = 256),
        buckets = 256)
      .as[(Long, Long)].collect().toSet
    assert(viaLit == viaLn)
  }

  test("lmWeightLiterals + lmScoreDocsWithTable ≡ engine-ln lmScoreDocs") {
    val target = Seq.tabulate(10)(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val docs = Seq(
      (100L, "the quick brown fox jumps"),
      (101L, "fox the jumps quick brown"),
      (102L, "zq xv jk wp mn"),
      (103L, "solo")
    ).toDF("id", "text")
    val wt = ImportanceScoring.lmWeightLiterals(target, "text", buckets = 256)
    // covers the unknown-context default and all observed contexts
    assert(wt.exists { case (a, b, _) => a == 1L && b == 256L })
    assert(wt.forall(_._3.scale == 6))
    val viaTable = ImportanceScoring.lmScoreDocsWithTable(docs, "id", "text",
        target, "text", wt, buckets = 256)
      .select("id", "lm_sum_e6", "n_bigrams", "mean_logp")
      .as[(Long, Long, Long, Double)].collect().toSet
    val viaLn = ImportanceScoring.lmScoreDocs(docs, "id", "text",
        target, "text", buckets = 256)
      .select("id", "lm_sum_e6", "n_bigrams", "mean_logp")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(viaTable == viaLn)
  }

  test("histogramDrift: identical corpora drift 0; disjoint corpora drift 2") {
    val a = Seq((1L, "aa bb cc"), (2L, "aa bb")).toDF("id", "text")
    val same = ImportanceScoring.l1Drift(
        ImportanceScoring.histogramDrift(a, a, "text"))
      .select("n_a", "n_b", "l1_e9")
      .as[(Long, Long, Long)].head()
    assert(same._1 == 5L && same._2 == 5L)
    assert(same._3 == 0L)
    // token-disjoint corpora: every bucket one-sided → Σ|a·Nb − c·Na| =
    // 2·Na·Nb exactly (assuming no FNV bucket collision between the two
    // tiny vocabularies — verified by the exact value)
    val b = Seq((1L, "xx yy zz xx")).toDF("id", "text")
    val far = ImportanceScoring.l1Drift(
        ImportanceScoring.histogramDrift(a, b, "text"))
      .select("l1_e9").as[Long].head()
    assert(far == 2000000000L)
  }

  test("histogramDrift gaps are the exact hand-computed integers") {
    // A: aa×3, bb×1 (Na=4); B: aa×1, bb×3 (Nb=4)
    // bucket(aa): |3·4 − 1·4| = 8; bucket(bb): |1·4 − 3·4| = 8; l1 = 16/16 = 1
    val a = Seq((1L, "aa aa aa bb")).toDF("id", "text")
    val b = Seq((1L, "aa bb bb bb")).toDF("id", "text")
    val gaps = ImportanceScoring.histogramDrift(a, b, "text")
      .select("cnt_a", "cnt_b", "gap")
      .as[(Long, Long, Long)].collect().toSet
    assert(gaps == Set((3L, 1L, 8L), (1L, 3L, 8L)))
    val l1 = ImportanceScoring.l1Drift(
        ImportanceScoring.histogramDrift(a, b, "text"))
      .select("l1_e9").as[Long].head()
    assert(l1 == 1000000000L)
  }

  test("driftTimeline: consecutive pairs only, equals pairwise l1Drift, gaps skip") {
    import org.apache.spark.sql.functions._
    // periods 1, 2, 3 and an isolated 7 (no predecessor/successor pair)
    val d = Seq(
      (1L, "aa aa bb"), (2L, "aa bb bb"), (3L, "aa bb bb"),
      (7L, "cc cc cc")
    ).flatMap { case (p, t) => Seq((p, t)) }.toDF("p", "text")
    val got = ImportanceScoring.driftTimeline(d, "text", col("p"), buckets = 64)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // only periods 2 and 3 have predecessors; 7 does not (4..7 absent)
    assert(got.keySet == Set(2L, 3L), got.toString)
    // identical consecutive corpora (2 vs 3) drift exactly 0
    assert(got(3L) == ((3L, 3L, 0L)), got.toString)
    // 1 vs 2 equals the pairwise operator on the same slices
    val ref = ImportanceScoring.l1Drift(ImportanceScoring.histogramDrift(
        d.filter(col("p") === 1).select("text"),
        d.filter(col("p") === 2).select("text"), "text", buckets = 64))
      .select("l1_e9").as[Long].head()
    assert(got(2L) == ((3L, 3L, ref)), s"timeline=${got(2L)} pairwise=$ref")
  }

  test("vocabChurnTimeline: consecutive-day set Jaccard; non-adjacent periods don't pair") {
    import org.apache.spark.sql.functions._
    val d = Seq(
      (1L, "a b c"), (2L, "b c d"),      // J(1,2) = 2/4 = 500000
      (2L, "b"),                          // dup tokens collapse (distinct sets)
      (4L, "x y")                         // gap: 3 missing → 4 pairs with nothing
    ).toDF("p", "text")
    val got = ImportanceScoring.vocabChurnTimeline(d, "text", col("p"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 3L, 3L, 2L, 500000L)), got.toString)
    // disjoint vocabularies → 0
    val dj = Seq((1L, "a"), (2L, "b")).toDF("p", "text")
    val g2 = ImportanceScoring.vocabChurnTimeline(dj, "text", col("p"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(g2 == Seq((2L, 1L, 1L, 0L, 0L)), g2.toString)
  }

  test("cusumChangepoint: max deviation locates the rate shift; ties to the earliest period") {
    import org.apache.spark.sql.functions._
    // rate doubles after period 2: counts 10,10,30,30 → D = 40,80,40,0
    def series(cs: Seq[(Long, Int)]) =
      cs.flatMap { case (p, n) => Seq.fill(n)(p) }.toDF("p")
    val got = ImportanceScoring.cusumChangepoint(
        series(Seq((1L, 10), (2L, 10), (3L, 30), (4L, 30))), col("p"))
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((2L, 80L, 4L, 80L)), got.toString)
    // symmetric series ties at D=40 on periods 1 and 3 → earliest wins
    val tied = ImportanceScoring.cusumChangepoint(
        series(Seq((1L, 30), (2L, 10), (3L, 10), (4L, 30))), col("p"))
      .as[(Long, Long, Long, Long)].head()
    assert(tied == ((1L, 40L, 4L, 80L)), tied.toString)
    // uniform series: D ≡ 0 everywhere → earliest period, stat 0
    val flat = ImportanceScoring.cusumChangepoint(
        series(Seq((1L, 5), (2L, 5), (3L, 5))), col("p"))
      .as[(Long, Long, Long, Long)].head()
    assert(flat == ((1L, 0L, 3L, 15L)), flat.toString)
    // empty series emits nothing
    assert(ImportanceScoring.cusumChangepoint(
      Seq.empty[Long].toDF("p"), col("p")).count() == 0)
  }
}
