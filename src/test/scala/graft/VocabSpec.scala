package graft

import org.apache.spark.sql.functions._
import graft.operators.Vocab

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("topTerms: frequency cut with boundary ties to ascending term") {
    val docs = Seq(
      "the cat sat", "the dog sat", "the cat ran", "a bird"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    // counts: the=3, cat=2, sat=2, a=1, bird=1, dog=1, ran=1
    val top3 = Vocab.topTerms(docs, "text", 3).as[(String, Long)].collect()
    assert(top3.toSeq == Seq(("the", 3L), ("cat", 2L), ("sat", 2L)))
    // the v=5 boundary sits inside the count-1 tie: term asc decides
    val top5 = Vocab.topTerms(docs, "text", 5).as[(String, Long)].collect()
    assert(top5.toSeq == Seq(("the", 3L), ("cat", 2L), ("sat", 2L),
      ("a", 1L), ("bird", 1L)))
    // case-folded: "The" and "the" count together
    val folded = Vocab.topTerms(Seq((0L, "The the THE")).toDF("id", "text"),
      "text", 1).as[(String, Long)].collect()
    assert(folded.toSeq == Seq(("the", 3L)))
  }

  test("oovStats: exact counts, one-division rate, zero-token docs report null") {
    val docs = Seq(
      (0L, "the cat sat on the mat"), // 6 tokens, oov: sat on mat → depends on vocab
      (1L, "zzz qqq"),                // fully OOV for a small vocab
      (2L, ""),                       // zero tokens
      (3L, "the the the")             // fully covered
    ).toDF("id", "text")
    val vocab = Seq("the", "cat").toDF("term")
    val out = Vocab.oovStats(docs, "id", "text", vocab)
      .orderBy("id")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      (0L, 6L, 3L, Some(3.0 / 6.0)),
      (1L, 2L, 2L, Some(1.0)),
      (2L, 0L, 0L, None),
      (3L, 3L, 0L, Some(0.0))), out.toString)
  }

  test("bpePairStats: word-frequency-weighted character pairs, tie order, single-char words skipped") {
    val docs = Seq(
      (0L, "ab AB abc"),  // folded: ab×2, abc×1
      (1L, "xy xz a q")   // xy×1, xz×1; 'a'/'q' too short to pair
    ).toDF("id", "text")
    val out = Vocab.bpePairStats(docs, "text", k = 10)
      .as[(String, String, Long)].collect().toSeq
    // (a,b): 2 from 'ab' + 1 from 'abc' = 3; the count-1 tie orders by (a, b)
    assert(out == Seq(
      ("a", "b", 3L), ("b", "c", 1L), ("x", "y", 1L), ("x", "z", 1L)), out.toString)
    // the cut is a bounded heap (TakeOrdered), never a global sort
    val plan = Vocab.bpePairStats(docs, "text", k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), plan)
    // k truncates inside a tie deterministically
    val top2 = Vocab.bpePairStats(docs, "text", k = 2)
      .as[(String, String, Long)].collect().toSeq
    assert(top2 == Seq(("a", "b", 3L), ("b", "c", 1L)), top2.toString)
  }

  test("bpeNextPairStats: winning pair merges leftmost-nonoverlapping; merged symbol re-pairs by name") {
    // round 1: (a,b) wins with 4 (from 'ab'×2, 'abc', 'xab');
    // round 2: 'ab'→<ab> leaves pairs (<ab>,c) from 'abc' and
    // (x,<ab>) from 'xab' — the merged symbol re-pairs under its name
    val docs = Seq(
      (0L, "ab ab abc xab"),
      (1L, "aaa")             // non-overlap probe: merge (a,a) would hit once
    ).toDF("id", "text")
    val out = Vocab.bpeNextPairStats(docs, "text", k = 10)
      .as[(String, String, Long)].collect().toSeq
    // 'aaa' contributes (a,a)=2 in round 1, so round-1 winner is still
    // (a,b)=4; after the merge: (a,a)=2 from 'aaa' unchanged, plus the
    // two merged-symbol pairs, ties ordered by (a, b)
    assert(out == Seq(
      ("a", "a", 2L), ("ab", "c", 1L), ("x", "ab", 1L)), out.toString)
    // and if (a,a) itself wins, 'aaa' merges ONCE (leftmost), leaving
    // (<aa>, a) — the non-overlap rule
    val solo = Seq((0L, "aaa aaa")).toDF("id", "text")
    val out2 = Vocab.bpeNextPairStats(solo, "text", k = 10)
      .as[(String, String, Long)].collect().toSeq
    assert(out2 == Seq(("aa", "a", 2L)), out2.toString)
  }

  test("oovStats composes with topTerms; vocab side broadcasts") {
    val docs = Seq(
      (0L, "alpha beta gamma"), (1L, "alpha beta"), (2L, "alpha delta")
    ).toDF("id", "text")
    // top-2 vocab: alpha=3, beta=2
    val out = Vocab.oovStats(docs, "id", "text",
        Vocab.topTerms(docs, "text", 2))
      .orderBy("id").as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      (0L, 3L, 1L, Some(1.0 / 3.0)),
      (1L, 2L, 0L, Some(0.0)),
      (2L, 2L, 1L, Some(0.5))), out.toString)
    val plan = Vocab.oovStats(docs, "id", "text", Vocab.topTerms(docs, "text", 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("topDocFrequencyTerms counts docs not occurrences; ties break to the term; cut is TakeOrdered") {
    val docs = Seq(
      (0L, "aa aa aa bb"), // aa×3 occurrences but df 1
      (1L, "bb cc"),
      (2L, "bb cc dd")
    ).toDF("id", "text")
    val out = Vocab.topDocFrequencyTerms(docs, "id", "text", k = 3)
      .as[(String, Long)].collect().toSeq
    // df: bb=3, cc=2, aa=1, dd=1 → top3 ties (aa,dd) break to "aa"
    assert(out == Seq(("bb", 3L), ("cc", 2L), ("aa", 1L)), out.toString)
    val plan = Vocab.topDocFrequencyTerms(docs, "id", "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("distinctiveTerms: tf·N/df rank, exact scaled scores, ties to ascending term, heap not window") {
    import graft.operators.Vocab
    // N=4 docs; "rare" df=1, "mid" df=2, "the" df=4
    val docs = Seq(
      (1L, "the rare rare mid"),
      (2L, "the mid"),
      (3L, "the the"),
      (4L, "the")
    ).toDF("id", "text")
    val out = Vocab.distinctiveTerms(docs, "id", "text", k = 2)
      .select("id", "term", "score_e6", "rank")
      .as[(Long, String, Long, Int)].collect()
      .groupBy(_._1)
    // doc 1: rare tf=2 df=1 -> 2*4/1=8; mid tf=1 df=2 -> 2; the tf=1 df=4 -> 1
    assert(out(1L).sortBy(_._4).map(t => (t._2, t._3)).toSeq ==
      Seq(("rare", 8000000L), ("mid", 2000000L)))
    // doc 3: the tf=2 df=4 -> 2*4/4=2 -> only term
    assert(out(3L).map(t => (t._2, t._3)).toSeq == Seq(("the", 2000000L)))
    // doc 2: mid 1*4/2=2, the 1*4/4=1 — tie-free; check order
    assert(out(2L).sortBy(_._4).map(_._2).toSeq == Seq("mid", "the"))
    // tie case: two terms with identical (tf, df) order by term asc
    val tied = Seq((1L, "bb aa")).toDF("id", "text")
    val tt = Vocab.distinctiveTerms(tied, "id", "text", k = 2)
      .orderBy("rank").select("term").as[String].collect().toSeq
    assert(tt == Seq("aa", "bb"))
    // per-doc cut is the bounded heap, not a window
    val plan = Vocab.distinctiveTerms(docs, "id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("graft_bottomk"), plan)
  }

  test("coverageCurve: exact cumulative coverage under (count desc, term asc); k past the vocab covers all") {
    import graft.operators.Vocab
    // freqs: a=4, b=3, c=2, d=1 -> total 10
    val docs = Seq("a a b c", "a A b B c d").toDF("text")
    val got = Vocab.coverageCurve(docs, "text", Seq(1, 2, 99))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 4L, 10L, 400000L),
      (2L, 7L, 10L, 700000L),
      (99L, 10L, 10L, 1000000L)
    ), got.toString)
  }

  test("ngramNovelty: first-seen by crawl order; re-crawls score zero; short docs = one shingle") {
    val d = Seq(
      (1L, "a b c d e"),    // bigrams: ab bc cd de — all novel
      (2L, "a b c d e"),    // exact re-crawl → 0 novel of 4
      (3L, "c d x y"),      // cd seen (doc 1); dx xy novel → 2/3
      (4L, "z")             // shorter than n → the whole-run shingle, novel
    ).toDF("id", "t")
    val got = Vocab.ngramNovelty(d, "id", "t", n = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((4L, 4L, 1000000L)),
      2L -> ((0L, 4L, 0L)),
      3L -> ((2L, 3L, 666666L)),
      4L -> ((1L, 1L, 1000000L))), got.toString)
    // repeated n-grams inside ONE doc count once (distinct per doc)
    val rep = Seq((1L, "p q p q p q")).toDF("id", "t")
    val r1 = Vocab.ngramNovelty(rep, "id", "t", n = 2)
      .as[(Long, Long, Long, Long)].head()
    assert(r1 == ((1L, 2L, 2L, 1000000L)), r1.toString) // distinct {p q, q p}
  }

  test("distinctNgramRatio: per-group distinct-over-total; repetition lowers the ratio") {
    // group a: "x x x x" → unigram instances 4, distinct 1;
    //          bigrams 3 instances, distinct 1 ("x x")
    // group b: "p q r" → 3/3 unigrams, 2/2 bigrams
    val d = Seq(("a", "x x x x"), ("b", "p q r")).toDF("src", "t")
    val got = Vocab.distinctNgramRatio(d, "src", "t", Seq(1, 2))
      .orderBy("src", "n")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 1L, 4L, 250000L),
      ("a", 2L, 1L, 3L, 333333L),
      ("b", 1L, 3L, 3L, 1000000L),
      ("b", 2L, 2L, 2L, 1000000L)
    ), got.toString)
    // multiple docs in one group pool their n-grams; a short doc
    // (fewer tokens than n) contributes its whole run as one shingle
    val m = Seq(("a", "x y"), ("a", "x y"), ("a", "z")).toDF("src", "t")
    val g2 = Vocab.distinctNgramRatio(m, "src", "t", Seq(2))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // bigram multiset: {"x y", "x y", "z"} → distinct 2, total 3
    assert(g2 == Seq(("a", 2L, 2L, 3L, 666666L)), g2.toString)
    intercept[IllegalArgumentException] {
      Vocab.distinctNgramRatio(d, "src", "t", Seq(1, 1))
    }
    intercept[IllegalArgumentException] {
      Vocab.distinctNgramRatio(d, "src", "t", Seq.empty)
    }
  }

  test("chiSquareTerms: hand-computed staged values, tie-broken ranks, k cut") {
    import spark.implicits._
    // g: [x x y], h: [y y z] → n = 6
    val d = Seq(("g", "x x y"), ("h", "y y z")).toDF("src", "t")
    val got = Vocab.chiSquareTerms(d, "src", "t", k = 5)
      .as[(String, String, Long, Int)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // x in g: a=2 b=0 c=1 d=3; m=6; r1=(6·6)//8=4; χ²e6=(4·6·1e6)//9=2666666
    assert(got(("g", "x")) == ((2666666L, 1)), got(("g", "x")).toString)
    // y in g: a=1 b=2 c=2 d=1; m=3; r1=18//9=2; χ²e6=6e6//9=666666
    assert(got(("g", "y")) == ((666666L, 2)), got(("g", "y")).toString)
    // z in h: a=1 b=0 c=2 d=3; m=3; r1=18//5=3; χ²e6=9e6//9=1000000
    assert(got(("h", "z")) == ((1000000L, 1)), got(("h", "z")).toString)
    assert(got(("h", "y")) == ((666666L, 2)), got(("h", "y")).toString)
    // k cut applies
    val top1 = Vocab.chiSquareTerms(d, "src", "t", k = 1)
      .as[(String, String, Long, Int)].collect()
    assert(top1.length == 2 && top1.forall(_._4 == 1))
    intercept[IllegalArgumentException] { Vocab.chiSquareTerms(d, "src", "t", 0) }
  }

  test("vocabGrowthCurve: exact distinct/total per prefix; empty prefix zeros; one tokenize pass semantics") {
    import spark.implicits._
    val d = Seq(
      (10L, "a b a"), (11L, "b c"), (12L, "d")
    ).toDF("id", "t")
    val got = Vocab.vocabGrowthCurve(d, "id", "t", Seq(5L, 11L, 12L, 100L))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (5L, 0L, 0L),     // prefix below every id: empty, both zero
      (11L, 2L, 3L),    // {a, b}, 3 tokens
      (12L, 3L, 5L),    // + {c}
      (100L, 4L, 6L)    // + {d}
    ), got.toString)
    // duplicate + unsorted checkpoints collapse and sort
    val dedup = Vocab.vocabGrowthCurve(d, "id", "t", Seq(12L, 11L, 12L))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(dedup == Seq((11L, 2L, 3L), (12L, 3L, 5L)))
    intercept[IllegalArgumentException] {
      Vocab.vocabGrowthCurve(d, "id", "t", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Vocab.vocabGrowthCurve(d, "id", "t", Seq(0L))
    }
  }
}
