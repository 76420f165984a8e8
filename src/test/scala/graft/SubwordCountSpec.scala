package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.plans.SubwordCount

class SubwordCountSpec extends SparkSpec {
  import spark.implicits._

  private def count(text: String, vocab: Seq[String]): java.lang.Long = {
    val df = Seq(Tuple1(text)).toDF("t")
      .select(TextFunctions.tokenCountSubword(col("t"), vocab).as("n"))
    val r = df.collect()(0)
    if (r.isNullAt(0)) null else Long.box(r.getLong(0))
  }

  test("greedy longest-match with ## continuations, hand-computed") {
    val vocab = Seq("wind", "wi", "w", "##ow", "##o", "##w")
    // longest start piece wins: wind + ##ow = 2 (not wi/w chains)
    assert(count("window", vocab) == 2L)
    // two words, each segmented independently
    assert(count("window window", vocab) == 4L)
    // all whitespace classes separate words
    assert(count("window\twindow\nwindowwindow\fwindow\rwindow", vocab) == 12L)
  }

  test("continuation pieces never match word-initially; start pieces never mid-word") {
    // "ow" exists only as a START piece: mid-word 'o','w' fall to UNK
    assert(count("window", Seq("wind", "ow")) == 3L) // wind + [UNK]o + [UNK]w
    // "##wind" exists only as CONTINUATION: word-initial falls to UNK ×4
    // then ##ow matches
    assert(count("window", Seq("##wind", "##ow")) == 5L)
    // word-initial "ow" does match as a start piece
    assert(count("ow", Seq("wind", "ow")) == 1L)
  }

  test("UNK fallback advances one CODEPOINT (surrogate pairs intact)") {
    // x + [UNK](one astral codepoint) + ##y — not 4 from a split pair
    assert(count("x😀y", Seq("x", "##y")) == 3L)
    // a fully out-of-vocab word costs its codepoint count
    assert(count("😀😁", Seq("zz")) == 2L)
  }

  test("empty/blank → 0; null → null; whole-word vocab ≡ whitespace count") {
    val vocab = Seq("a", "##b")
    assert(count("", vocab) == 0L)
    assert(count("  \t\n ", vocab) == 0L)
    val df = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(TextFunctions.tokenCountSubword(col("t"), vocab).as("n"))
    assert(df.collect()(0).isNullAt(0))
    // a vocab of exactly the corpus words reproduces tokenCount
    val words = Seq("alpha", "beta", "gamma")
    val text = "alpha beta gamma beta alpha"
    assert(count(text, words) == 5L)
  }

  test("vocab validation: empty, whitespace-bearing, duplicate pieces rejected") {
    intercept[IllegalArgumentException] { count("x", Seq.empty) }
    intercept[IllegalArgumentException] { count("x", Seq("a b")) }
    intercept[IllegalArgumentException] { count("x", Seq("a", "a")) }
    // duplicate across position classes is FINE (different lookups)
    assert(count("aa", Seq("a", "##a")) == 2L)
  }

  test("SQL registration: graft_subword_count with literal pieces") {
    graft.plans.GraftExtensions.registerAll(spark)
    val n = spark.sql(
      "SELECT graft_subword_count('window scan', 'wind', '##ow', 'scan') AS n")
      .as[Long].head()
    assert(n == 3L)
  }

  test("codegen and interpreted paths agree") {
    val vocab = Seq("wind", "##ow", "sc", "##an", "s", "c", "a", "n",
      "##s", "##c", "##a", "##n")
    val df = Seq("window scan", "scans", "", "wow").toDF("t")
    val viaExpr = df
      .select(TextFunctions.tokenCountSubword(col("t"), vocab).as("n"))
      .as[Long].collect().toSeq
    // direct eval of the same expression object
    val sc = SubwordCount(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), vocab)
    val direct = Seq("window scan", "scans", "", "wow").map(t =>
      sc.count(org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    assert(viaExpr == direct)
    // hand check: window=2, scan=2 → 4; scans = sc+##an+##s = 3; wow:
    // 'w' has no matching start piece ('wind' doesn't fit) → UNK, then
    // the "ow" tail matches ##ow → 2
    assert(direct == Seq(4L, 3L, 0L, 2L))
  }
}
