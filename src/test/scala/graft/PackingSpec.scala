package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("concat-and-chunk: pack by first-token position, straddlers spill, strata independent") {
    val d = Seq(
      // stratum a: tokens 6,3,4 with budget 8 → prev 0,6,9
      (1L, "a", 6L), (2L, "a", 3L), (3L, "a", 4L),
      // stratum b: one doc larger than the budget still gets a pack
      (10L, "b", 20L), (11L, "b", 1L)
    ).toDF("id", "src", "n")
    val out = Packing.packByTokenBudget(d, col("n"), "id", budget = 8L,
        strataCols = Seq("src"))
      .select("id", "pack_id", "pack_offset")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0L, 0L)))
    assert(out(2L) == ((0L, 6L))) // starts inside pack 0, tail spills into 1
    assert(out(3L) == ((1L, 1L))) // first token at position 9
    assert(out(10L) == ((0L, 0L)))
    assert(out(11L) == ((2L, 4L))) // prev 20 → pack 2, offset 4
    // summary: token totals by starting pack
    val s = Packing.packSummary(
        Packing.packByTokenBudget(d, col("n"), "id", 8L, Seq("src")),
        col("n"), Seq("src"))
      .select("src", "pack_id", "n_docs", "n_tokens")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(s.contains(("a", 0L, 2L, 9L)))
    assert(s.contains(("a", 1L, 1L, 4L)))
  }

  test("global stratum is refused by default (single-task sort) and needs allowGlobal") {
    val d = (1L to 100L).map(i => (i, 10L)).toDF("id", "n")
    // the scale guard: no strata = one global Window.partitionBy() =
    // every row through a single task — refuse unless explicitly allowed
    val e = intercept[IllegalArgumentException] {
      Packing.packByTokenBudget(d, col("n"), "id", budget = 35L)
    }
    assert(e.getMessage.contains("one task"))
    val out = Packing.packByTokenBudget(d, col("n"), "id", budget = 35L,
        allowGlobal = true)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    // doc i has prev = 10(i-1); pack = floor(10(i-1)/35)
    (1L to 100L).foreach { i =>
      assert(out(i) == (10 * (i - 1)) / 35, s"doc $i")
    }
  }

  test("chunkByTokens: sliding windows overlap by the carry, last window reaches the end") {
    val d = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "a b c"),                          // shorter than one chunk
      (3L, ""),                               // zero tokens → no rows
      (4L, "  x   y  ")                       // ragged whitespace
    ).toDF("id", "text")
    val out = Packing.chunkByTokens(d, "text", "id", chunkTokens = 4, overlapTokens = 1)
      .select("id", "chunk_idx", "chunk_text", "n_tokens")
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    // stride 3: starts 0,3,6 — start 6 reaches token 10, so 3 chunks
    assert(out(1L) == Seq(
      ("t1 t2 t3 t4", 4L), ("t4 t5 t6 t7", 4L), ("t7 t8 t9 t10", 4L)))
    assert(out(2L) == Seq(("a b c", 3L)))
    assert(!out.contains(3L))
    assert(out(4L) == Seq(("x y", 2L)))
    // no-overlap mode tiles exactly; the tail chunk is the remainder
    val tiled = Packing.chunkByTokens(d.filter(col("id") === 1L), "text", "id",
        chunkTokens = 4, overlapTokens = 0)
      .select("chunk_text", "n_tokens").as[(String, Long)].collect().toSeq
    assert(tiled == Seq(("t1 t2 t3 t4", 4L), ("t5 t6 t7 t8", 4L), ("t9 t10", 2L)))
    // a zero stride can never advance — refused
    intercept[IllegalArgumentException] {
      Packing.chunkByTokens(d, "text", "id", chunkTokens = 4, overlapTokens = 4)
    }
  }

  test("lengthBucketBatches: bucket by n div width, batch in id order, waste bounded") {
    // widths: ids 1..5 have 1,2,3,9,10 tokens; width 8 → bucket 0 for
    // n<8 (ids 1,2,3), bucket 1 for 9,10 (ids 4,5); batchSize 2 splits
    // bucket 0 into batches [1,2] and [3]
    val d = Seq(
      (1L, "a"), (2L, "a b"), (3L, "a b c"),
      (4L, "a b c d e f g h i"), (5L, "a b c d e f g h i j")
    ).toDF("doc_id", "text")
    val out = Packing.lengthBucketBatches(d, "doc_id", "text",
        bucketWidth = 8, batchSize = 2)
      .select("doc_id", "n_tokens", "bucket", "batch_idx", "slot")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((1L, 0L, 0L, 0L)))
    assert(out(2L) == ((2L, 0L, 0L, 1L)))
    assert(out(3L) == ((3L, 0L, 1L, 0L)))
    assert(out(4L) == ((9L, 1L, 0L, 0L)))
    assert(out(5L) == ((10L, 1L, 0L, 1L)))
    // padding accounting: batch (0,0) pads 1 (max 2 over {1,2});
    // singleton batches pad 0; batch (1,0) pads 1 (max 10 over {9,10})
    val waste = Packing.paddingWaste(
        Packing.lengthBucketBatches(d, "doc_id", "text", 8, 2))
      .select("bucket", "batch_idx", "n_docs", "max_tokens", "sum_tokens", "pad_waste")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(waste == Set(
      (0L, 0L, 2L, 2L, 3L, 1L),
      (0L, 1L, 1L, 3L, 3L, 0L),
      (1L, 0L, 2L, 10L, 19L, 1L)))
    // within-bucket waste bound: (width−1)·batchSize
    waste.foreach { case (_, _, _, _, _, w) => assert(w <= 7L * 2L) }
  }

  test("lengthBucketBatches ranks match a brute-force window at scale shape") {
    val d = (1L to 200L).map(i => (i, ("w " * (i % 37 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val fast = Packing.lengthBucketBatches(d, "doc_id", "text",
        bucketWidth = 8, batchSize = 4, rankBuckets = 4)
      .select("doc_id", "bucket", "batch_idx", "slot")
      .as[(Long, Long, Long, Long)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val brute = d
      .withColumn("n", graft.functions.TextFunctions.tokenCount(col("text")))
      .withColumn("bucket", expr("n div 8L"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("bucket").orderBy("doc_id")) - 1)
      .select(col("doc_id"), col("bucket"),
        expr("rk div 4").cast("long").as("batch_idx"),
        (col("rk") % 4).cast("long").as("slot"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fast == brute)
    // every row_number window partitions by (length-bucket, id-range
    // sub-bucket), never the length-bucket alone — length-buckets are
    // few and huge at corpus scale, the exact skew funnel forbidden here
    val plan = Packing.lengthBucketBatches(d, "doc_id", "text",
        bucketWidth = 8, batchSize = 4, rankBuckets = 4)
      .queryExecution.optimizedPlan.toString
    val rnWindows = plan.linesIterator.filter(_.contains("row_number")).toSeq
    assert(rnWindows.nonEmpty && rnWindows.forall(_.contains("_b")), plan)
  }

  test("materializePacks: EOS-joined member texts in order; straddlers stay in their start pack") {
    val d = Seq(
      (1L, "s", "a b c", 3L),   // pack 0: tokens 0-2
      (2L, "s", "d e", 2L),     // pack 0: starts at 3 (straddles into 5+)
      (3L, "s", "f", 1L),       // pack 1: starts at 5
      (4L, "t", "x y", 2L)      // other stratum, own pack 0
    ).toDF("id", "src", "text", "nt")
    val packed = Packing.packByTokenBudget(d, $"nt", "id", budget = 5L,
      strataCols = Seq("src"))
    val out = Packing.materializePacks(packed, "text", $"nt", "id", Seq("src"))
      .orderBy("src", "pack_id")
      .as[(String, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      ("s", 0L, 2L, 5L, "a b c <eos> d e"),
      ("s", 1L, 1L, 1L, "f"),
      ("t", 0L, 1L, 2L, "x y")), out.toString)
  }

  test("shardByTokenBudget: equals the brute-force prefix sum over the shuffle order; layout-stable; bucket-bounded windows") {
    import org.apache.spark.sql.graft.ColumnBridge
    val docs = (0L until 300L).map(i => (i, ("w " * ((i % 17).toInt + 1)).trim))
      .toDF("id", "text")
    val nt = graft.functions.TextFunctions.tokenCount($"text")
    val out = Packing.shardByTokenBudget(docs, "id", nt, budget = 100L, salt = "s")
      .select("id", "tape_pos", "shard").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // brute force: driver-side (hash, id) order, running token sum
    val h = ColumnBridge.column(graft.plans.FnvHash64(
      ColumnBridge.expression(concat(lit("s:"), $"id".cast("string")))))
    val rows = docs.select($"id", nt.as("nt")).withColumn("_h", h)
      .as[(Long, Long, Long)].collect().sortBy { case (id, _, hh) => (hh, id) }
    var acc = 0L
    val ref = rows.map { case (id, n, _) =>
      val r = (id, acc, acc / 100L); acc += n; r
    }.sortBy(_._1).toSeq
    assert(out == ref)
    // partitioning must not change the layout
    val out2 = Packing.shardByTokenBudget(docs.repartition(7), "id", nt,
        budget = 100L, salt = "s")
      .select("id", "tape_pos", "shard").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(out2 == ref)
    // the running-sum window partitions by the hash bucket, never global
    val plan = Packing.shardByTokenBudget(docs, "id", nt, 100L, "s")
      .queryExecution.optimizedPlan.toString
    val runWindows = plan.linesIterator
      .filter(l => l.contains("windowspecdefinition") && l.contains("_h")).toSeq
    assert(runWindows.nonEmpty && runWindows.forall(_.contains("_b")), plan)
  }

  test("cdcChunks: gear boundaries are local — an insertion moves only its own chunk") {
    import graft.operators.Packing
    val base = (1 to 200).map(i => s"w$i").mkString(" ")
    // the same text with 3 tokens injected near the front: every chunk
    // whose 2-token contexts are untouched must survive VERBATIM
    val shifted = ((1 to 5).map(i => s"w$i") ++ Seq("x1", "x2", "x3") ++
      (6 to 200).map(i => s"w$i")).mkString(" ")
    val d = Seq((1L, base), (2L, shifted)).toDF("id", "t")
    val out = Packing.cdcChunks(d, "id", "t", divisor = 8)
      .as[(Long, Long, String, Long)].collect()
    val c1 = out.filter(_._1 == 1L).map(_._3).toSet
    val c2 = out.filter(_._1 == 2L).map(_._3).toSet
    // fixed-width chunking would share ~nothing after the insertion;
    // CDC shares every chunk strictly after the perturbed region
    val shared = c1.intersect(c2)
    assert(shared.nonEmpty, s"no shared chunks:\n$c1\n$c2")
    // everything in the doc tail (well past the insertion) is shared
    val tailChunks = c1.filter(_.contains("w190"))
    assert(tailChunks.nonEmpty && tailChunks.subsetOf(shared), s"tail not shared: $tailChunks vs $shared")
    // chunks tile the doc: concatenating in chunk_idx order rebuilds it
    val rebuilt = out.filter(_._1 == 1L).sortBy(_._2).map(_._3).mkString(" ")
    assert(rebuilt == base)
    // token counts sum to the doc's
    assert(out.filter(_._1 == 1L).map(_._4).sum == 200L)
    // boundary rate is in a sane band (the w1..w200 bigrams are highly
    // similar strings — FNV low bits run hot on them, so the band is
    // wide; the 1/divisor expectation is an iid idealization)
    val n1 = out.count(_._1 == 1L)
    assert(n1 >= 5 && n1 <= 100, s"chunk count $n1 implausible for divisor 8 over 200 tokens")
    intercept[IllegalArgumentException] {
      Packing.cdcChunks(d, "id", "t", divisor = 12) // not a power of two
    }
  }

  test("sentenceChunks: terminator+spaces splits, spaces consumed, blanks drop, indices over kept") {
    val d = Seq(
      (0L, "One two. Three four?  Five!"),  // 3 sentences, double space ok
      (1L, "no terminator here"),           // 1 sentence
      (2L, "Trailing dot. "),               // trailing blank fragment drops
      (3L, ""),                             // empty doc → no rows
      (4L, "a.b stays one")                 // dot NOT followed by space: no split
    ).toDF("id", "t")
    val out = Packing.sentenceChunks(d, "id", "t")
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    assert(out(0L) == Seq(("One two.", 2L), ("Three four?", 2L), ("Five!", 1L)), out.toString)
    assert(out(1L) == Seq(("no terminator here", 3L)))
    assert(out(2L) == Seq(("Trailing dot.", 2L)))
    assert(!out.contains(3L))
    assert(out(4L) == Seq(("a.b stays one", 3L)))
    // no shuffle: single map stage (explode), no Exchange in the plan
    val plan = Packing.sentenceChunks(d, "id", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("optimalLengthBucketBounds: exact DP optimum; degenerate and report cases") {
    import spark.implicits._
    // histogram: len 1 ×10, len 2 ×1, len 10 ×1, len 11 ×10. With 2
    // buckets the enumerated optima are: split after 1 → 10, after 2 →
    // 11, after 10 → 98. The DP must pick [(1,1),(2,11)].
    val rows = Seq.fill(10)(1L) ++ Seq(2L, 10L) ++ Seq.fill(10)(11L)
    val df = rows.toDF("n")
    val bounds = Packing.optimalLengthBucketBounds(df, col("n"), 2)
    assert(bounds == Seq((1L, 1L), (2L, 11L)), bounds.toString)
    // B >= distinct lengths: one bucket per length, zero waste
    val all = Packing.optimalLengthBucketBounds(df, col("n"), 10)
    assert(all == Seq((1L, 1L), (2L, 2L), (10L, 10L), (11L, 11L)), all.toString)
    // report: bucket 1 pads (1×9 + 10×1 + 0×10)=wait — hand-check below
    val rep = Packing.paddingReport(df, col("n"), bounds)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // bucket 0: 10 rows of len 1 → padded 10, waste 0
    assert(rep(0) == ((0L, 1L, 1L, 10L, 10L, 10L, 0L)), rep(0).toString)
    // bucket 1: lens 2,10 + 10×11 → n=12, sum=122, padded 132, waste 10
    assert(rep(1) == ((1L, 2L, 11L, 12L, 122L, 132L, 10L)), rep(1).toString)
    // the DP optimum beats the fixed-width alternative's waste
    val fixedWaste = {
      val alt = Seq((1L, 6L), (7L, 11L))
      Packing.paddingReport(df, col("n"), alt)
        .agg(org.apache.spark.sql.functions.sum("waste_tokens"))
        .as[Long].collect().head
    }
    assert(rep.map(_._7).sum < fixedWaste, s"dp=${rep.map(_._7).sum} fixed=$fixedWaste")
    intercept[IllegalArgumentException] {
      Packing.optimalLengthBucketBounds(df, col("n"), 0)
    }
    intercept[IllegalArgumentException] {
      Packing.optimalLengthBucketBounds(df, col("n"), 2, maxDistinct = 2)
    }
  }
}
