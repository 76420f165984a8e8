package graft

import graft.operators.Collocations

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("topBigramsByLift: hand-computed lifts, bigram-stream marginals, total tie order") {
    // bigrams: doc1 "a b a b c" -> (a,b),(b,a),(a,b),(b,c);
    //          doc2 "a b x"     -> (a,b),(b,x);  N = 6
    // c_xy: (a,b)=3 (b,a)=1 (b,c)=1 (b,x)=1; firsts a=3 b=3; seconds b=3 a=1 c=1 x=1
    // lift(a,b) = 3·6/(3·3) = 2.0; lift(b,·) = 1·6/(3·1) = 2.0 — all tie,
    // so the (w1, w2) tie-break decides the cut deterministically
    val docs = Seq("a b a b c", "a b x").toDF("text")
    val got = Collocations.topBigramsByLift(docs, "text", k = 3, minCount = 1L)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 3L, 3L, 3L, 2.0),
      ("b", "a", 1L, 3L, 1L, 2.0),
      ("b", "c", 1L, 3L, 1L, 2.0)))
    // minCount prunes rare pairs but marginals still count them: with
    // minCount=2 only (a,b) survives, and its c_x stays 3 (the pruned
    // (b,·) pairs keep feeding b's first-position marginal)
    val freq = Collocations.topBigramsByLift(docs, "text", k = 10, minCount = 2L)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(freq == Seq(("a", "b", 3L, 3L, 3L, 2.0)))
    // single-token and empty docs contribute nothing, never crash
    val sparse = Seq("solo", "", "x y").toDF("text")
    val s = Collocations.topBigramsByLift(sparse, "text", k = 5, minCount = 1L)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(s == Seq(("x", "y", 1L, 1L, 1L, 1.0)))
  }

  test("plan shape: k-bounded cut, histogram-fed marginals, no window") {
    val docs = Seq("a b c d e", "b c d e f").toDF("text")
    val q = Collocations.topBigramsByLift(docs, "text", k = 5, minCount = 1L)
    val plan = q.queryExecution.executedPlan.toString
    // the cut is TakeOrdered (two-stage k-bounded), never a global Sort
    // feeding a Limit, and no Window anywhere
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window"), plan)
    // the bigram histogram partial-aggregates map-side before any
    // exchange (two-phase aggregate on (w1, w2))
    assert(plan.split("HashAggregate").length - 1 >= 2, plan)
  }
}
