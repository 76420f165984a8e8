package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

class TextVectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace, bpe-ish, chars") {
    val out = Seq("Hello, world! 42").toDF("t").select(
      TF.tokenCount($"t"), TF.bpeishTokenCount($"t"), TF.charCount($"t"))
      .as[(Long, Long, Long)].collect()(0)
    assert(out == ((3L, 5L, 16L))) // bpe-ish: Hello , world ! 42
  }

  test("empty text: zero tokens, zero ratios") {
    val out = Seq("", "   ").toDF("t").select(
      TF.tokenCount($"t"), TF.punctRatio($"t"), TF.stopwordRatio($"t"))
      .as[(Long, Double, Double)].collect()
    assert(out.forall(r => r._1 == 0L && r._3 == 0.0))
  }

  test("stopword ratio and quality score") {
    val good = "the cat sat on the mat and it was a good day for sitting outside"
    val out = Seq(good).toDF("t").select(TF.stopwordRatio($"t"), TF.qualityScore($"t"))
      .as[(Double, Double)].collect()(0)
    assert(out._1 > 0.2 && out._1 < 0.8)
    assert(out._2 == 1.0)
  }

  test("langId picks marker-heaviest language; no markers -> und") {
    val out = Seq("the cat and the dog", "el gato de la casa que", "zzz qqq").toDF("t")
      .select(TF.langId($"t")).as[String].collect().toSeq
    assert(out == Seq("en", "es", "und"))
  }

  test("repetition signals: duplicate lines, top-token and top-2gram dominance") {
    val repetitive = "buy now\nbuy now\nbuy now\nlimited offer"
    val clean = "a quick brown fox jumps over one lazy dog"
    val out = Seq(repetitive, clean, "", "word").toDF("t").select(
      TF.duplicateLineFraction($"t"),
      TF.maxTokenFreq($"t"),
      TF.topTokenRatio($"t"),
      TF.topNgramRatio($"t", 2))
      .as[(Double, Int, Double, Double)].collect()
    // repetitive: 4 lines, 2 dup copies of "buy now"; tokens: buy×3 now×3
    // limited offer → 8 tokens, top 3; 2-grams: 7, "buy now"×3
    assert(out(0) == ((0.5, 3, 0.375, 3.0 / 7.0)))
    // clean: all distinct
    assert(out(1)._1 == 0.0 && out(1)._2 == 1 && out(1)._4 == 1.0 / 8.0)
    // empty: all zero
    assert(out(2) == ((0.0, 0, 0.0, 0.0)))
    // single token: no 2-gram exists -> ratio 0, not 1
    assert(out(3) == ((0.0, 1, 1.0, 0.0)))
  }

  test("Gopher structural rules: symbol ratio, bullet/ellipsis lines, alpha words") {
    val bullety = "- item one\n- item two\n  * item three\nplain line"
    val elliptic = "to be continued...\nand then...\nthe end"
    val symbolic = "## head ## tag # x ..." // 5 '#' + 1 '...' over 7 words
    val numeric = "12 34 56 ab"             // 1 alpha word of 4
    val clean = "a perfectly ordinary sentence"
    val out = Seq(bullety, elliptic, symbolic, numeric, clean, "").toDF("t").select(
      TF.symbolToWordRatio($"t"), TF.bulletLineFraction($"t"),
      TF.ellipsisLineFraction($"t"), TF.alphaWordRatio($"t"),
      TF.gopherStructuralPass($"t"))
      .as[(Double, Double, Double, Double, Boolean)].collect()
    // 3 of 4 bullet lines (under 0.9), but the bare markers are non-alpha
    // words: alpha 8/11 < 0.8 correctly fails the doc overall
    assert(out(0)._2 == 0.75 && out(0)._4 == 8.0 / 11.0 && !out(0)._5)
    assert(out(1)._3 == 2.0 / 3.0 && !out(1)._5) // ellipsis lines over 0.3
    assert(out(2)._1 == 6.0 / 7.0 && !out(2)._5) // symbol-heavy
    assert(out(3)._4 == 0.25 && !out(3)._5)      // alpha-poor
    assert(out(4) == ((0.0, 0.0, 0.0, 1.0, true)))
    assert(out(5) == ((0.0, 0.0, 0.0, 0.0, false))) // empty: alpha 0 < 0.8
  }

  test("meanTokenLen: average token length, 0 for empty") {
    val out = Seq("ab abcd", "").toDF("t").select(TF.meanTokenLen($"t"))
      .as[Double].collect()
    assert(out(0) == 3.0 && out(1) == 0.0)
  }

  test("PII redaction: emails, phones, IPs replaced; counts match") {
    val t = "write bob.smith+x@corp.example.org or call (555) 123 4567; host 192.168.0.1 ok"
    val out = Seq(t).toDF("t").select(
      TF.redact($"t"),
      TF.patternCount($"t", TF.EmailPattern),
      TF.patternCount($"t", TF.PhonePattern),
      TF.patternCount($"t", TF.Ipv4Pattern))
      .as[(String, Long, Long, Long)].collect()(0)
    assert(out._1 == "write [EMAIL] or call [PHONE]; host [IP] ok", out._1)
    assert((out._2, out._3, out._4) == ((1L, 1L, 1L)))
    // clean text passes through untouched
    val clean = "no personal data in this sentence at all"
    assert(Seq(clean).toDF("t").select(TF.redact($"t")).as[String].collect()(0) == clean)
  }

  test("fingerprint normalization: case/punct/whitespace-insensitive") {
    val out = Seq("Hello,  World!", "hello world").toDF("t")
      .select(TF.fingerprintXx($"t")).as[Long].collect()
    assert(out(0) == out(1))
  }

  test("shingles: word n-grams; short docs collapse to one shingle") {
    val out = Seq("a b c d", "a b").toDF("t")
      .select(TF.shingles($"t", 3)).as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("a b"))
  }

  test("vector dot/norm/cosine/l2") {
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    val out = df.select(
      VF.dot($"a", $"b"), VF.norm($"a"), VF.cosine($"a", $"a"), VF.l2Distance($"a", $"b"))
      .as[(Double, Double, Double, Double)].collect()(0)
    assert(out._1 == 24.0)
    assert(out._2 == 5.0)
    assert(math.abs(out._3 - 1.0) < 1e-12)
    assert(math.abs(out._4 - math.sqrt(2.0)) < 1e-12)
  }

  test("cosine of zero vector is 0, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(df.select(VF.cosine($"a", $"b")).as[Double].collect()(0) == 0.0)
  }

  test("CJK token count: each CJK codepoint is a token; Latin runs count once") {
    import graft.functions.TextFunctions
    val cases = Seq(
      ("hello world", 2L),                    // pure Latin = ws tokens
      ("你好世界", 4L),                        // unsegmented Han: 4, not 1
      ("abc漢字def", 4L),                      // CJK breaks a Latin run
      ("hello 世界 ok", 4L),
      ("ひらがなとカタカナ", 9L),               // kana count individually
      ("한국어 텍스트", 6L),                    // Hangul syllables
      ("𠀀x", 2L),                  // U+20000 (supplementary plane)
      ("  \t\n ", 0L),
      ("", 0L)
    )
    val out = cases.zipWithIndex.map { case ((s, _), i) => (i.toLong, s) }
      .toDF("i", "s")
      .select($"i", TextFunctions.tokenCountCjk($"s").as("n"))
      .as[(Long, Long)].collect().toMap
    cases.zipWithIndex.foreach { case ((s, want), i) =>
      assert(out(i.toLong) == want, s"'$s': got ${out(i.toLong)}, want $want")
    }
    // CJK-free text: identical to the whitespace count on real docs
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mism = d.select(
        TextFunctions.tokenCount($"text").as("ws"),
        TextFunctions.tokenCountCjk($"text").as("cjk"))
      .filter($"ws" =!= $"cjk")
    assert(mism.isEmpty)
    // null text -> null, not a crash
    val n = Seq[(Long, String)]((1L, null)).toDF("i", "s")
      .select(TextFunctions.tokenCountCjk($"s")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("script-aware langId: zh/ja/ko by codepoint class, Latin falls through to markers") {
    import graft.functions.TextFunctions
    val cases = Seq(
      (1L, "这是一段很长的中文文本没有任何假名只有汉字", "zh"),
      (2L, "これはにほんごのテキストですかなまる", "ja"),        // kana-heavy
      (3L, "日本語の文章は漢字とかなを混ぜて書きます", "ja"),    // kanji + kana
      (4L, "이것은 한국어 텍스트입니다 한글 음절", "ko"),
      (5L, "the quick brown fox and the lazy dog", "en"),
      (6L, "el perro y el gato de la casa que los", "es"),
      (7L, "xq zt vw", "und")
    ).toDF("id", "text", "want")
    val out = cases.select($"id", $"want",
        TextFunctions.langIdWithScript($"text").as("got"))
      .as[(Long, String, String)].collect()
    out.foreach { case (i, want, got) => assert(got == want, s"case $i: $got != $want") }
  }

  test("cjkAware Gopher rules keep an unsegmented Chinese doc the default rules misgrade") {
    import graft.functions.TextFunctions
    // a perfectly ordinary Chinese paragraph: one whitespace token under
    // the default counter (fails the alpha rule at ~0), dozens of tokens
    // under the CJK counter (passes everything)
    val zh = "这是一个完全正常的中文段落没有任何质量问题应该被保留在训练数据中"
    val en = "this is a perfectly normal english paragraph with no quality problems at all"
    val df = Seq((1L, zh), (2L, en)).toDF("id", "text")
    val out = df.select($"id",
        TextFunctions.gopherStructuralPass($"text").as("plain"),
        TextFunctions.gopherStructuralPass($"text", cjkAware = true).as("cjk"),
        TextFunctions.alphaWordRatio($"text", cjkAware = true).as("alpha"))
      .as[(Long, Boolean, Boolean, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(!out(1L)._2, "default rules should (wrongly) reject the zh doc")
    assert(out(1L)._3, "cjkAware rules should keep it")
    assert(out(1L)._4 == 1.0) // every CJK codepoint is an alpha word
    // Latin text: both modes agree
    assert(out(2L)._2 && out(2L)._3)
  }

  test("qualityScore cjkAware drops the English-stopword component entirely") {
    import graft.functions.TextFunctions
    // unsegmented Chinese: ~1 whitespace token (fails length), 0 stopword
    // hits — the plain score punishes both; cjkAware must not re-penalize
    // via the (English) stopword list it can't satisfy
    val zh = "这是一个完全正常的中文段落没有任何质量问题应该被保留在训练数据中"
    val en = "this is a perfectly normal english paragraph with the usual stopwords in it"
    val df = Seq((1L, zh), (2L, en)).toDF("id", "text")
    val out = df.select($"id",
        TextFunctions.qualityScore($"text").as("plain"),
        TextFunctions.qualityScore($"text", cjkAware = true).as("cjk"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 <= 0.2, "plain score wrongly near-zeroes the zh doc")
    assert(out(1L)._2 == 1.0, "cjkAware: length + punct pass, no stopword term")
    // English doc scores full marks under both weightings
    assert(out(2L)._1 == 1.0 && out(2L)._2 == 1.0)
  }

  test("quantize8/dequantize8: codes in [0,255], reconstruction within scale/2") {
    import graft.functions.VectorFunctions
    val df = Seq(
      (1L, Seq(0.0f, 0.5f, 1.0f, -1.0f)),
      (2L, Seq(3.25f, 3.25f, 3.25f)), // constant vector: scale 0, exact
      (3L, Seq(-2.0f, 7.5f, 0.125f, 100.0f, -33.3f))
    ).toDF("id", "v")
    val out = df.select($"id", $"v", VectorFunctions.quantize8($"v").as("qv"))
      .select($"id", $"v", $"qv.q".as("q"), $"qv.scale".as("scale"),
        VectorFunctions.dequantize8($"qv").as("vhat"))
      .as[(Long, Seq[Float], Seq[Int], Double, Seq[Double])].collect()
    out.foreach { case (id, v, q, scale, vhat) =>
      assert(q.forall(c => c >= 0 && c <= 255), s"row $id codes $q")
      v.zip(vhat).foreach { case (orig, rec) =>
        assert(math.abs(orig.toDouble - rec) <= scale / 2 + 1e-12,
          s"row $id: $orig vs $rec at scale $scale")
      }
      // min and max land exactly on codes 0 and 255 (affine endpoints)
      if (scale > 0) {
        assert(q.contains(0) && q.contains(255), s"row $id codes $q")
      }
    }
    val const = out.find(_._1 == 2L).get
    assert(const._3.forall(_ == 0) && const._4 == 0.0)
    assert(const._5.forall(_ == 3.25))
  }

  test("dedupLinesInDoc: first occurrences in order; blank lines and nulls safe") {
    val out = Seq(
      "a\nb\na\nc\nb",   // interior dups
      "x\n\nx\n\ny",      // duplicate blank lines collapse too
      "solo",
      ""
    ).toDF("t").select(TF.dedupLinesInDoc($"t")).as[String].collect().toSeq
    assert(out == Seq("a\nb\nc", "x\n\ny", "solo", ""))
    // self-concat recovers a dup-free original exactly (the gate's form)
    val round = Seq("l1\nl2\nl3").toDF("t")
      .select(TF.dedupLinesInDoc(concat($"t", lit("\n"), $"t")))
      .as[String].collect()(0)
    assert(round == "l1\nl2\nl3")
    val nul = Seq[Option[String]](None).toDF("t")
      .select(TF.dedupLinesInDoc($"t")).as[Option[String]].collect()(0)
    assert(nul.isEmpty)
  }

  test("langPurity: per-line majority + fraction; ties break to larger lang; blank-only docs absent") {
    val docs = Seq(
      (1L, "the cat is on the mat\nthe dog is here\nle chat est la"), // 2 en, 1 fr
      (2L, "le la les\nder und das"),                                  // 1 fr, 1 de tie -> fr
      (3L, "\n  \n"),                                                  // nothing to classify
      (4L, "zzz qqq")                                                  // no markers -> und
    ).toDF("id", "t")
    val out = TF.langPurity(docs, "id", "t")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 4L)) // doc 3 absent
    assert(out(0)._2 == "en" && math.abs(out(0)._3 - 2.0 / 3.0) < 1e-15)
    assert(out(1)._2 == "fr" && out(1)._3 == 0.5) // (1,'fr') beats (1,'de')
    assert(out(2)._2 == "und" && out(2)._3 == 1.0)
  }

  test("truncateToTokens: budget clamp, whitespace normalization, short docs intact") {
    val out = Seq("  a   b\tc d ", "one two", "", "   ").toDF("t")
      .select(TF.truncateToTokens($"t", 3)).as[String].collect().toSeq
    assert(out == Seq("a b c", "one two", "", ""))
    intercept[IllegalArgumentException] { TF.truncateToTokens(lit("x"), 0) }
  }

  test("c4KeptLines/c4DocPass: the C4 line rules and page drops") {
    val docs = Seq(
      (0L, "This line ends well.\nTiny.\nno terminal mark here\n" +
        "She said \"stop\"\nTrailing spaces okay.   "),
      (1L, "Lorem IPSUM dolor sit amet."),       // page drop: lorem ipsum (any case)
      (2L, "A valid sentence right here.\n{ \"j\": 1 }"), // page drop: curly brace
      (3L, "nothing survives this one")          // page drop: zero kept lines
    ).toDF("id", "text")
    val kept = TF.c4KeptLines($"text")
    val out = docs.select($"id", array_join(kept, "|").as("clean"),
        TF.c4DocPass($"text", kept).as("pass"))
      .orderBy("id").as[(Long, String, Boolean)].collect().toSeq
    // doc 0: short line, no-terminal line drop; quote-tail and
    // trailing-space lines survive
    assert(out(0) == ((0L,
      "This line ends well.|She said \"stop\"|Trailing spaces okay.   ", true)),
      out(0).toString)
    // the lorem/brace drops are PAGE-level: kept lines still report,
    // the pass flag falls
    assert(out(1) == ((1L, "Lorem IPSUM dolor sit amet.", false)))
    assert(out(2) == ((2L, "A valid sentence right here.", false)))
    assert(out(3) == ((3L, "", false)))
    // minWordsPerLine is a real knob: at 4, the 3-word quote line drops
    val kept4 = TF.c4KeptLines($"text", minWordsPerLine = 4)
    val c0 = docs.filter($"id" === 0L)
      .select(array_join(kept4, "|")).as[String].head()
    assert(c0 == "This line ends well.")
  }

  test("sentenceCount and hasBlockedWord: the C4 policy primitives") {
    val rows = Seq(
      (0L, "One. Two! Three? trailing tail without mark"),
      (1L, "no terminal marks at all"),
      (2L, "Ellipsis... counts once. Right."),
      (3L, "Contains a BadWord here."),
      (4L, "classify is not a blocked substring match.")
    ).toDF("id", "t")
    val out = rows.select($"id", TF.sentenceCount($"t").as("n"),
        TF.hasBlockedWord($"t", Seq("badword", "ass")).as("b"))
      .orderBy("id").as[(Long, Long, Boolean)].collect().toSeq
    // ids: sentences / blocked
    assert(out == Seq(
      (0L, 3L, false),
      (1L, 0L, false),
      (2L, 3L, false),  // "Ellipsis..." is ONE terminal run, then two more
      (3L, 1L, true),   // case-blind exact token (BadWord -> badword)
      (4L, 1L, false)), // "classify" must not trip the "ass" block
      out.toString)
  }

  test("bpeTokenCount: rank-order merges, leftmost-nonoverlapping, case-folded, empty→0") {
    val merges = Seq("t" -> "h", "th" -> "e", "l" -> "l")
    val d = Seq(
      (0L, "THE the"),    // t h e → th e → the: 1 symbol, twice
      (1L, "hello"),      // h e l l o → h e ll o: 4 (only l+l fires)
      (2L, "lll"),        // l l l → ll l: leftmost-nonoverlap, 2 symbols
      (3L, "a"),          // single char: 1
      (4L, ""),           // blank → 0 tokens
      (5L, "theta")       // t h e t a → th e t a → the t a: 3
    ).toDF("id", "t")
    val out = d.select($"id",
        TF.bpeTokenCount($"t", merges).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 2L, 1L -> 4L, 2L -> 2L, 3L -> 1L, 4L -> 0L, 5L -> 3L), out.toString)
    // merge symbols must be space-free and non-empty
    intercept[IllegalArgumentException] {
      TF.bpeTokenCount($"t", Seq("a b" -> "c"))
    }
    intercept[IllegalArgumentException] {
      TF.bpeTokenCount($"t", Seq.empty)
    }
  }

  test("stripHtml: tags to spaces, one-level entity decode (&amp; last), whitespace collapse") {
    val got = Seq(
      "<p>hello <b>world</b></p>",
      "a &lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39;",
      "&amp;lt; stays escaped one level",
      "  <br/> spaced\t\nout  <hr >",
      "plain"
    ).toDF("t").select(TF.stripHtml($"t")).as[String].collect().toSeq
    assert(got(0) == "hello world")
    assert(got(1) == "a <tag> & \"q\" 's'")
    // double-escaped decodes exactly one level: &amp;lt; → &lt;, not <
    assert(got(2) == "&lt; stays escaped one level")
    assert(got(3) == "spaced out")
    assert(got(4) == "plain")
  }
}
