package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankScaled: matches a hand-rolled integer reference; dangling mass drops") {
    // a -> b, a -> c, b -> c, c -> a, plus dangling sink d (a -> d)
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("a", "d")
    ).toDF("src", "dst")
    val got = Graph.pageRankScaled(edges, "src", "dst", iterations = 3)
      .as[(String, Long)].collect().toMap

    // driver-side reference with the exact documented arithmetic
    val es = Seq("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a", "a" -> "d")
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val od = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size.toLong
    val d = 850000L
    val base = (1000000000L * (1000000L - d)) / (n * 1000000L)
    var r = nodes.map(_ -> 1000000000L / n).toMap
    for (_ <- 0 until 3) {
      val in = es.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        (r(s) * d / 1000000L) / od(s)
      }.sum).toMap
      r = nodes.map(v => v -> (base + in.getOrElse(v, 0L))).toMap
    }
    assert(got == r, s"got=$got ref=$r")
    // dangling node d absorbs rank but emits none: total mass < 1e9
    assert(got.values.sum < 1000000000L)
    // multi-edges weight double: duplicating a->b must raise b's rank
    val multi = Graph.pageRankScaled(
        (edges.as[(String, String)].collect().toSeq :+ ("a", "b")).toDF("src", "dst"),
        "src", "dst", iterations = 3)
      .as[(String, Long)].collect().toMap
    assert(multi("b") > got("b"), s"multi=$multi single=$got")
    intercept[IllegalArgumentException] {
      Graph.pageRankScaled(edges, "src", "dst", iterations = 0)
    }
  }
}
