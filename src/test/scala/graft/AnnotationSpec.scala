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
}
