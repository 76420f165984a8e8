package graft

import graft.operators.Preference
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  /** The operator's exact integer arithmetic, replayed move for move. */
  private def replay(cmp: Seq[(String, String)], rounds: Int): Map[String, Long] = {
    val items = (cmp.map(_._1) ++ cmp.map(_._2)).distinct.sorted
    val n = items.size.toLong
    val wins = items.map(i => i -> cmp.count(_._1 == i).toLong).toMap
    val oriented = cmp.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .withDefaultValue(0L)
    val nij = (for {
      i <- items; j <- items if i != j
      nn = oriented((i, j)) + oriented((j, i)) if nn > 0
    } yield (i, j) -> nn).toMap
    var g = items.map(_ -> 1000000L).toMap
    for (_ <- 1 to rounds) {
      val gp = items.map { i =>
        val dSum = nij.collect { case ((a, b), nn) if a == i =>
          nn * 1000000000000L / (g(i) + g(b))
        }.sum
        val dd = math.max(1L, dSum)
        i -> math.min(1000000000000L,
          math.max(1L, wins(i) * 1000000000000L / dd))
      }.toMap
      val tot = gp.values.map(BigInt(_)).sum
      g = gp.map { case (i, v) =>
        i -> math.max(1L, ((BigInt(v) * BigInt(n * 1000000L)) / tot).toLong)
      }
    }
    g
  }

  test("bradleyTerryScaled: matches the hand-replayed MM arithmetic; wins/comparisons columns exact") {
    val cmp = Seq(("a", "b"), ("a", "b"), ("a", "b"), ("b", "a"),
      ("b", "c"), ("b", "c"), ("a", "c"))
    val got = Preference.bradleyTerryScaled(
        cmp.toDF("winner", "loser"), "winner", "loser", rounds = 3)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val exp = replay(cmp, 3)
    assert(got.view.mapValues(_._1).toMap == exp, s"got=$got exp=$exp")
    assert(got("a")._2 == 4L && got("b")._2 == 3L && got("c")._2 == 0L)
    // comparisons = all matches the item took part in, either side
    assert(got("a")._3 == 5L && got("b")._3 == 6L && got("c")._3 == 3L)
    // ratings sum to n_items * 1e6 up to the per-item truncation/floor
    val s = got.values.map(_._1).sum
    assert(s <= 3000000L + 3 && s >= 3000000L - 3, s.toString)
  }

  test("bradleyTerryScaled: a dominant item tops the table; a never-winner floors above zero") {
    // d beats everyone twice; c loses every match it plays
    val cmp = (for {
      x <- Seq("a", "b", "c"); _ <- 1 to 2
    } yield ("d", x)) ++ Seq(("a", "b"), ("b", "a"), ("a", "c"), ("b", "c"))
    val got = Preference.bradleyTerryScaled(
        cmp.toDF("winner", "loser"), "winner", "loser", rounds = 6)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got("d") == got.values.max, got.toString)
    assert(got("c") == got.values.min && got("c") >= 1L, got.toString)
    // a and b are symmetric by construction — identical ratings
    assert(got("a") == got("b"), got.toString)
  }

  test("applyBtBatch: stream ≡ batch on the concatenated log; replay no-op; torn commit converges; counts merge additively") {
    import graft.streaming.StreamingOps
    val b0 = Seq(("a", "b"), ("a", "b"), ("b", "c")).toDF("winner", "loser")
    val b1 = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("b", "c"))
      .toDF("winner", "loser")
    val all = b0.unionByName(b1)
    val dir = java.nio.file.Files.createTempDirectory("graft-bt-spec").toString
    def step(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingOps.applyBtBatch(spark, b, id, "winner", "loser", rounds = 3,
        s"$dir/state", s"$dir/out")
    step(b0, 0L)
    // batch-0 ratings equal the batch operator on batch 0
    assert(rows(spark.read.parquet(s"$dir/out/batch=0").orderBy("item")) ==
      rows(Preference.bradleyTerryScaled(b0, "winner", "loser", rounds = 3)
        .orderBy("item")))
    step(b1, 1L)
    val r1 = rows(spark.read.parquet(s"$dir/out/batch=1").orderBy("item"))
    // the accumulated ratings equal the batch operator on the full log
    assert(r1 == rows(Preference.bradleyTerryScaled(all, "winner", "loser",
      rounds = 3).orderBy("item")))
    // state holds additive oriented counts, never raw rows
    val st = StreamingOps.readState(spark, s"$dir/state").get
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(st(("a", "b")) == 3L && st(("b", "c")) == 2L && st(("b", "a")) == 1L)
    // replay no-ops; torn commit recomputes bit-identically
    step(b1, 1L)
    assert(StreamingOps.currentVersionId(spark, s"$dir/state").contains(1L))
    assert(rows(spark.read.parquet(s"$dir/out/batch=1").orderBy("item")) == r1)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/state/_CURRENT"), true)
    try out.write("v0".getBytes("UTF-8")) finally out.close()
    step(b1, 1L)
    assert(StreamingOps.currentVersionId(spark, s"$dir/state").contains(1L))
    assert(rows(spark.read.parquet(s"$dir/out/batch=1").orderBy("item")) == r1)
  }

  test("applyBtBatch with ties: stream ≡ the batch ties operator on the concatenated log; half-unit state") {
    import graft.streaming.StreamingOps
    val b0 = Seq(("a", "b", false), ("a", "b", true)).toDF("winner", "loser", "is_tie")
    val b1 = Seq(("b", "c", true), ("a", "c", false)).toDF("winner", "loser", "is_tie")
    val all = b0.unionByName(b1)
    val dir = java.nio.file.Files.createTempDirectory("graft-btt-spec").toString
    def step(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      StreamingOps.applyBtBatch(spark, b, id, "winner", "loser", rounds = 3,
        s"$dir/state", s"$dir/out", tieCol = Some("is_tie"))
    step(b0, 0L)
    step(b1, 1L)
    assert(rows(spark.read.parquet(s"$dir/out/batch=1").orderBy("item")) ==
      rows(Preference.bradleyTerryScaledWithTies(all, "winner", "loser",
        "is_tie", rounds = 3).orderBy("item")))
    // the state carries HALF-UNIT oriented counts: a beat b once (2) +
    // tied once (1 each way); b tied c once (1 each way); a beat c (2)
    val st = StreamingOps.readState(spark, s"$dir/state").get
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(st == Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "c") -> 1L,
      ("c", "b") -> 1L, ("a", "c") -> 2L), st.toString)
    // replay no-op
    step(b1, 1L)
    assert(StreamingOps.currentVersionId(spark, s"$dir/state").contains(1L))
  }

  test("bradleyTerryScaledWithTies: half-win units equal the explicit half-unit counts; order win > tie > loss") {
    // equivalence: {a beats b once, a ties b twice} must equal the
    // half-unit count table {(a,b): 2 + 2, (b,a): 2} fed directly
    val log = Seq(("a", "b", false), ("a", "b", true), ("b", "a", true))
      .toDF("winner", "loser", "is_tie")
    val viaTies = Preference.bradleyTerryScaledWithTies(log,
        "winner", "loser", "is_tie", rounds = 3)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    val viaCounts = Preference.bradleyTerryFromCounts(
        Seq(("a", "b", 4L), ("b", "a", 2L)).toDF("_i", "_j", "_wn"),
        rounds = 3)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(viaTies == viaCounts, s"ties=$viaTies counts=$viaCounts")
    // pure-tie log: symmetric by construction, equal ratings
    val allTie = Seq(("a", "b", true), ("a", "b", true))
      .toDF("winner", "loser", "is_tie")
    val sym = Preference.bradleyTerryScaledWithTies(allTie,
        "winner", "loser", "is_tie", rounds = 4)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(sym("a") == sym("b"), sym.toString)
    // win > tie > loss: a beats c twice, b only ties c twice
    val mixed = Seq(("a", "c", false), ("a", "c", false),
      ("b", "c", true), ("b", "c", true)).toDF("winner", "loser", "is_tie")
    val r = Preference.bradleyTerryScaledWithTies(mixed,
        "winner", "loser", "is_tie", rounds = 6)
      .as[(String, Long, Long, Long)].collect().map(x => x._1 -> x._2).toMap
    assert(r("a") > r("b") && r("b") > r("c"), r.toString)
    // null tie flags drop with the null-id rows
    val messy = Seq(("a", "b", Some(false)), ("a", "b", None))
      .toDF("winner", "loser", "is_tie")
    val clean = Preference.bradleyTerryScaledWithTies(messy,
        "winner", "loser", "is_tie", rounds = 2)
      .as[(String, Long, Long, Long)].collect().map(x => x._1 -> x._3).toMap
    assert(clean("a") == 2L && clean("b") == 0L, clean.toString) // one decisive row, half-units
  }

  test("ratingsWithConnectivity: planted islands get distinct components and spans_all=false; connected log flags true") {
    val islands = Seq(("a", "b"), ("b", "a"), ("c", "d"))
      .toDF("winner", "loser")
    val got = Preference.ratingsWithConnectivity(islands,
        "winner", "loser", rounds = 3)
      .select("item", "component", "component_items", "spans_all")
      .as[(String, String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set("a", "b", "c", "d"))
    assert(got("a") == (("a", 2L, false)) && got("b") == (("a", 2L, false)),
      got.toString)
    assert(got("c") == (("c", 2L, false)) && got("d") == (("c", 2L, false)),
      got.toString)
    // ratings on the islands still match the plain operator (the
    // diagnostic decorates, never perturbs)
    val plain = Preference.bradleyTerryScaled(islands, "winner", "loser",
        rounds = 3)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val withC = Preference.ratingsWithConnectivity(islands,
        "winner", "loser", rounds = 3)
      .select("item", "rating_e6").as[(String, Long)].collect().toMap
    assert(withC == plain, s"withC=$withC plain=$plain")
    // a bridge comparison connects the graph: one component, flag true
    val bridged = islands.unionByName(Seq(("b", "c")).toDF("winner", "loser"))
    val all = Preference.ratingsWithConnectivity(bridged,
        "winner", "loser", rounds = 3)
      .select("component", "component_items", "spans_all")
      .as[(String, Long, Boolean)].collect().toSet
    assert(all == Set(("a", 4L, true)), all.toString)
  }

  test("bradleyTerryScaled: null/self rows drop; tripwires and bounds refuse") {
    val messy = Seq(("a", "b"), ("a", "a"), (null, "b"), ("b", null), ("b", "a"))
      .toDF("winner", "loser")
    val got = Preference.bradleyTerryScaled(messy, "winner", "loser", rounds = 2)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got.keySet == Set("a", "b") && got("a") == got("b"), got.toString)
    intercept[IllegalArgumentException](
      Preference.bradleyTerryScaled(messy, "winner", "loser", rounds = 0))
    intercept[IllegalArgumentException](
      Preference.bradleyTerryScaled(messy, "winner", "loser", rounds = 33))
    // > 1e6 comparisons on one pair refuses loudly (zero-action tripwire)
    val heavy = spark.range(1000001L)
      .select(lit("a").as("winner"), lit("b").as("loser"))
    val e = intercept[Exception](
      Preference.bradleyTerryScaled(heavy, "winner", "loser", rounds = 1)
        .collect())
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(x => Option(x.getMessage)).getOrElse("")
    assert(msg.contains("10^6"), e.toString)
  }
}
