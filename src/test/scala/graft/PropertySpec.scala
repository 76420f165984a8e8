package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.model._
import graft.operators.{Binning, Dedup, Merge}

/** Property-based invariants (SURVEY §5.2): scalacheck-generated inputs,
  * algebraic laws the operators must satisfy regardless of data. (Raw
  * Gen sampling — the scalatest/scalacheck bridge isn't a dependency.)
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "the")
  private val docGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))

  test("bin-count invariant: Σ counts = rows × levels for every binner") {
    samples(Gen.nonEmptyListOf(Gen.chooseNum(-9999.0, 9999.0)), 5).foreach { vs =>
      val df = vs.toDF("v")
      val total = Binning.binAndCount(df, Seq(NumericBinner("n", "v", 2)))
        .agg(coalesce(sum("count"), lit(0L))).as[Long].collect()(0)
      assert(total == vs.size.toLong * 3, s"vs=$vs") // levels 0..2
    }
  }

  test("$inc collapse is order-independent (sum associativity/commutativity)") {
    samples(Gen.listOfN(8, Gen.chooseNum(-1000L, 1000L)), 5).foreach { ns =>
      val spec = MergeSpec(Seq("k"), Seq(MergeFieldSpec("n", MergeOp.Inc)))
      def collapse(order: List[Long]): Long =
        Merge.collapseIncoming(
          order.zipWithIndex.map { case (n, i) => (1L, n, i) }.toDF("k", "n", "seq"),
          spec, "seq")
          .select("n").as[Long].collect()(0)
      assert(collapse(ns) == collapse(ns.reverse), s"ns=$ns")
      assert(collapse(ns) == ns.sum, s"ns=$ns")
    }
  }

  test("$addToSet merge is idempotent and order-insensitive") {
    samples(Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d")), 5).foreach { tags =>
      val state = Seq((1L, Seq("a"))).toDF("k", "tags")
      val inc = Seq((1L, tags)).toDF("k", "tags")
      val spec = MergeSpec(Seq("k"), Seq(MergeFieldSpec("tags", MergeOp.AddToSet)))
      val once = Merge.merge(state, inc, spec).state
        .select(array_sort($"tags")).as[Seq[String]].collect()(0)
      val twice = Merge.merge(Merge.merge(state, inc, spec).state, inc, spec).state
        .select(array_sort($"tags")).as[Seq[String]].collect()(0)
      assert(once == twice, s"tags=$tags")
      assert(once.toSet == (tags.toSet + "a"), s"tags=$tags")
    }
  }

  test("exact dedup is idempotent and stable") {
    samples(Gen.listOfN(8, docGen), 5).foreach { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val d1 = Dedup.exact(df, "text", "id")
      val d2 = Dedup.exact(d1, "text", "id")
      assert(d1.count() == d2.count(), s"docs=$docs")
      assert(rows(d1.select("id")) == rows(d2.select("id")), s"docs=$docs")
    }
  }

  test("minhash signature overlap estimate is within [0,1] and 1 for identical docs") {
    samples(docGen, 5).foreach { doc =>
      val df = Seq((1L, doc), (2L, doc)).toDF("id", "text")
      val pairs = Dedup.minHashDupPairs(df, "text", "id", 16, 8, 0.0)
        .select("est_jaccard").as[Double].collect()
      assert(pairs.forall(e => e >= 0.0 && e <= 1.0), s"doc=$doc")
      assert(pairs.contains(1.0), s"doc=$doc")
    }
  }

  test("CrossConcat equals the composed HOF cross product on generated arrays") {
    val arrGen = Gen.listOf(Gen.oneOf("a", "bb", "", "é", "x|y"))
    val tripleGen = Gen.zip(arrGen, arrGen, arrGen)
    samples(tripleGen, 8).foreach { case (a, b, c) =>
      val df = Seq((a, b, c)).toDF("a", "b", "c")
      val parts = Seq(col("a"), col("b"), col("c"))
      val native = df.select(Binning.mergedBinNames("m", parts))
        .as[Seq[String]].collect()(0)
      val composed = df.select(Binning.mergedBinNamesComposed("m", parts))
        .as[Seq[String]].collect()(0)
      assert(native == composed, s"a=$a b=$b c=$c")
    }
  }

  test("MarkerCounts invariants: bounded by token count, zero on marker-free docs") {
    import graft.functions.{TextFunctions => TF}
    val sets = TF.LangMarkers.map(_._2)
    samples(Gen.listOfN(10, Gen.oneOf("the", "la", "der", "qqq", "zz")), 8).foreach { toks =>
      val df = Seq(toks.mkString(" ")).toDF("t")
      val counts = df.select(TF.markerCounts(TF.tokens(lower($"t")), sets))
        .as[Seq[Int]].collect()(0)
      assert(counts.length == sets.length)
      assert(counts.forall(c => c >= 0 && c <= toks.length), s"toks=$toks")
      // "la" belongs to es AND fr: both counts include every "la"
      val la = toks.count(_ == "la")
      assert(counts(1) >= la && counts(2) >= la, s"toks=$toks counts=$counts")
    }
  }

  test("TopTokenFreq: equals driver-side max multiplicity; bounded by n") {
    import org.apache.spark.sql.graft.ColumnBridge
    samples(Gen.listOfN(12, Gen.oneOf("a", "b", "c")), 8).foreach { toks =>
      val df = Seq(toks).toDF("ts")
      val got = df.select(ColumnBridge.column(
          graft.plans.TopTokenFreq(ColumnBridge.expression($"ts"))))
        .as[Int].collect()(0)
      val want = if (toks.isEmpty) 0 else toks.groupBy(identity).values.map(_.size).max
      assert(got == want, s"toks=$toks")
    }
  }

  test("json array-sum expressions match driver-side sums on generated arrays") {
    val gen = Gen.listOfN(200, Gen.listOf(Gen.chooseNum(-1000000, 1000000)))
    val lists = gen.pureApply(Gen.Parameters.default, Seed(42L))
    val rows = lists.zipWithIndex.map { case (xs, i) =>
      (i, "[" + xs.mkString(",") + "]", xs.map(_.toLong).sum, xs.map(_.toDouble).sum)
    }
    val df = rows.toDF("id", "s", "lsum", "dsum")
    import graft.functions.TypedAttrs
    val bad = df.select(
        col("id"),
        TypedAttrs.intArraySum(col("s")).as("l"),
        TypedAttrs.doubleArraySum(col("s")).as("d"),
        col("lsum"), col("dsum"))
      .filter(col("l") =!= col("lsum") || col("d") =!= col("dsum"))
      .count()
    assert(bad == 0)
  }

  test("chunkByTokens laws: tiling reconstructs, chunks bounded, overlap carried") {
    import graft.operators.Packing
    samples(Gen.listOfN(40, wordGen), 5).zipWithIndex.foreach { case (ws, i) =>
      val text = ws.mkString(" ")
      val df = Seq((1L, text)).toDF("id", "text")
      // overlap 0: chunks tile the token sequence exactly
      val tiled = Packing.chunkByTokens(df, "text", "id", 7, 0)
        .orderBy("chunk_idx").select("chunk_text").as[String].collect()
      assert(tiled.flatMap(_.split(" ")).toSeq == ws, s"case $i")
      // every chunk is within budget and non-empty
      val withOv = Packing.chunkByTokens(df, "text", "id", 7, 3)
        .orderBy("chunk_idx")
        .select("chunk_text", "n_tokens").as[(String, Long)].collect()
      assert(withOv.forall { case (t, n) => n >= 1 && n <= 7 && t.split(" ").length == n })
      // consecutive full chunks share exactly `overlap` tokens
      withOv.map(_._1.split(" ").toSeq).toSeq.sliding(2).foreach {
        case Seq(a, b) if a.length == 7 => assert(a.takeRight(3) == b.take(3))
        case _ =>
      }
    }
  }

  test("boilerplateRemove law: every output line came from that doc, order kept") {
    import graft.operators.Dedup
    val lineGen = Gen.listOfN(5, wordGen).map(_.mkString(" "))
    samples(Gen.listOfN(6, Gen.listOfN(4, lineGen)), 3).foreach { docs =>
      val df = docs.zipWithIndex.map { case (ls, i) => (i.toLong, ls.mkString("\n")) }
        .toDF("id", "text")
      val out = Dedup.boilerplateRemove(df, "text", "id", maxDocs = 3)
        .as[(Long, String)].collect().toMap
      docs.zipWithIndex.foreach { case (ls, i) =>
        val kept = out(i.toLong).split("\n", -1).filter(_.nonEmpty).toSeq
        // subsequence of the original line sequence (order and multiplicity)
        var rest = ls
        kept.foreach { k =>
          val at = rest.indexOf(k)
          assert(at >= 0, s"line '$k' not in doc $i remainder")
          rest = rest.drop(at + 1)
        }
      }
    }
  }

  test("removeDuplicatedWindows laws: ordered subsequence, n_removed accounting, whole-copy erasure") {
    import graft.operators.Dedup
    val docGen = Gen.listOfN(8, Gen.listOfN(9, wordGen).map(_.mkString(" ")))
    samples(docGen, 3).foreach { texts =>
      // append one exact copy of doc 0 under the largest id: the law
      // says the COPY must vanish entirely (its every window is a dup
      // of the keeper's) while doc 0 survives untouched by that copy
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
        (99L, texts.head)
      val df = docs.toDF("id", "text")
      val out = Dedup.removeDuplicatedWindows(df, "id", "text", window = 4)
        .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      docs.foreach { case (id, orig) =>
        val (clean, nRemoved) = out(id)
        val origToks = orig.split("\\s+").filter(_.nonEmpty).toSeq
        val keptToks = clean.split("\\s+").filter(_.nonEmpty).toSeq
        // clean is an ordered subsequence of the original tokens
        var rest = origToks
        keptToks.foreach { k =>
          val at = rest.indexOf(k)
          assert(at >= 0, s"token '$k' not in doc $id remainder")
          rest = rest.drop(at + 1)
        }
        // accounting: removed + kept = original
        assert(nRemoved == origToks.size - keptToks.size, s"doc $id")
      }
      assert(out(99L)._1 == "", s"exact copy survived: ${out(99L)}")
    }
  }

  test("deterministicShuffle law: output positions are exactly 1..n at any size") {
    import graft.operators.Sampling
    Seq(0, 1, 7, 100).foreach { n =>
      val df = spark.range(0, n).toDF("id")
      val pos = Sampling.deterministicShuffle(df, "id", "law")
        .select("pos").as[Long].collect().sorted.toSeq
      assert(pos == (1L to n.toLong), s"n=$n: $pos")
    }
  }

  test("TokenWindowHashes law: rolling equals the direct polynomial on generated arrays") {
    import org.apache.spark.sql.graft.ColumnBridge
    import graft.plans.{FnvHash64, TokenWindowHashes}
    import org.apache.spark.unsafe.types.UTF8String
    val arrGen = Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, wordGen))
    samples(arrGen, 8).foreach { toks =>
      val w = 3
      val got = Seq(Tuple1(toks)).toDF("t")
        .select(ColumnBridge.column(TokenWindowHashes(
          ColumnBridge.expression(col("t")), w)).as("a"))
        .selectExpr("transform(a, p -> p.h)").as[Seq[Long]].head()
      def th(s: String) = FnvHash64.hash(UTF8String.fromString(s))
      def direct(ts: Seq[String]) =
        ts.foldLeft(0L)((acc, t) => acc * TokenWindowHashes.Base + th(t))
      val want =
        if (toks.isEmpty) Seq.empty[Long]
        else if (toks.size <= w) Seq(direct(toks))
        else toks.sliding(w).map(direct).toSeq
      assert(got == want, s"toks=$toks")
    }
  }

  test("funnel depth laws: bounded by k, monotone under event append") {
    import graft.operators.Funnel
    val steps = Seq("a", "b", "c")
    val evGen = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 20L), Gen.oneOf("a", "b", "c", "z")))
    samples(evGen, 5).foreach { evs =>
      val df = evs.toDF("u", "t", "et")
      val d1 = Funnel.depths(df, "u", "t", "et", steps)
        .as[(Long, Long)].collect().toMap
      assert(d1.values.forall(d => d >= 0 && d <= 3))
      // appending more events can only hold or deepen every user's funnel
      val extra = Seq((1L, 21L, "b"), (2L, 22L, "c"), (3L, 23L, "a"))
      val d2 = Funnel.depths(df.unionByName(extra.toDF("u", "t", "et")),
          "u", "t", "et", steps)
        .as[(Long, Long)].collect().toMap
      d1.foreach { case (u, d) => assert(d2(u) >= d, s"user $u regressed: $d -> ${d2(u)}") }
    }
  }

  test("bpeTokenCount laws: bounded by [word count, char count]; merges only shrink") {
    import graft.functions.TextFunctions
    val merges = Seq("t" -> "h", "th" -> "e", "a" -> "l", "al" -> "p")
    samples(docGen, 8).foreach { text =>
      val df = Seq((1L, text)).toDF("id", "t")
      val (words, chars, bpe, bpePrefix) = df.select(
          TextFunctions.tokenCount($"t"),
          TextFunctions.charCount($"t") - TextFunctions.tokenCount($"t") + 1,
          TextFunctions.bpeTokenCount($"t", merges),
          TextFunctions.bpeTokenCount($"t", merges.take(2)))
        .as[(Long, Long, Long, Long)].head()
      // every word is ≥1 symbol; no word exceeds its own char count
      assert(bpe >= words, s"$text: bpe=$bpe words=$words")
      assert(bpe <= chars + words, s"$text: bpe=$bpe chars=$chars")
      // applying MORE merges never increases the symbol count
      assert(bpe <= bpePrefix, s"$text: full=$bpe prefix=$bpePrefix")
    }
  }

  test("cdcChunks laws: tiling reconstructs, token counts sum, chunk_idx dense from 0") {
    import graft.operators.Packing
    samples(Gen.listOfN(60, wordGen), 6).zipWithIndex.foreach { case (ws, i) =>
      val text = ws.mkString(" ")
      val out = Packing.cdcChunks(Seq((1L, text)).toDF("id", "t"), "id", "t", divisor = 4)
        .orderBy("chunk_idx")
        .select("chunk_idx", "chunk_text", "n_tokens")
        .as[(Long, String, Long)].collect()
      assert(out.flatMap(_._2.split(" ")).toSeq == ws, s"case $i")
      assert(out.map(_._3).sum == ws.length.toLong, s"case $i")
      assert(out.map(_._1).toSeq == out.indices.map(_.toLong), s"case $i")
    }
  }

  test("ArrayInversions laws: equals brute force; reversal complements; ties never count") {
    samples(Gen.listOfN(40, Gen.chooseNum(0L, 12L)), 8).zipWithIndex.foreach {
      case (xs, i) =>
        val arr = xs.toArray
        val brute = (for { a <- arr.indices; b <- a + 1 until arr.length
                           if arr(a) > arr(b) } yield 1).size.toLong
        assert(graft.plans.ArrayInversions.countLongs(arr.clone()) == brute, s"case $i")
        // inversions(xs) + inversions(reverse) = pairs of UNEQUAL values
        val rev = (for { a <- arr.indices; b <- a + 1 until arr.length
                         if arr(a) != arr(b) } yield 1).size.toLong
        val both = brute +
          graft.plans.ArrayInversions.countLongs(arr.reverse.clone())
        assert(both == rev, s"case $i: $both != $rev")
    }
  }

  test("rankCorrelationByGroup law: Kendall from inversion counting equals the quadratic definition for any permutation and block size") {
    val permGen = Gen.listOfN(23, Gen.chooseNum(0L, 1000000L))
    samples(permGen, 5).zipWithIndex.foreach { case (ys, i) =>
      val rows = ys.zipWithIndex.map { case (y, idx) =>
        ("g", idx.toLong, idx.toLong, y)
      }
      val df = rows.toDF("g", "id", "x", "y")
      // brute-force discordant pairs over the (x-rank, y-rank) pairs —
      // y ranks break value ties by id, mirroring the operator's window
      val ranked = ys.zipWithIndex
        .sortBy { case (y, idx) => (y, idx.toLong) }
        .zipWithIndex.map { case ((_, idx), r) => idx -> (r + 1).toLong }
        .toMap
      val ry = (0 until ys.length).map(ranked)
      val brute = (for { a <- ry.indices; b <- a + 1 until ry.length
                         if ry(a) > ry(b) } yield 1).size.toLong
      for (block <- Seq(2, 5, 4096)) {
        val got = graft.operators.Profile
          .rankCorrelationByGroup(df, "g", "id", "x", "y", seedBlockSize = block)
          .select("n_discordant").as[Long].collect()(0)
        assert(got == brute, s"case $i block $block: $got != $brute")
      }
    }
  }
}
