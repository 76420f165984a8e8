package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // byte-based AQE coalescing under-parallelizes CPU-heavy text stages
      // on small local files; 16k floor keeps them spread across cores
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      // InferFiltersFromGenerate clones the full generator-input expression
      // tree (regex tokenization) into a scan-level filter — pure overhead
      // for our explode pipelines, whose generators drop nothing
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional stage profile: per-stage executor run time + task count to
    // stderr — the single-task-stage check is the first diagnostic for any
    // per-query regression (a 1-task stage = a serialization bug)
    if (sys.env.contains("SPARK_GRAFT_BENCH_STAGES")) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          System.err.println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"runTime=${si.taskMetrics.executorRunTime / 1e3}%8.2fs " +
            f"cpuTime=${si.taskMetrics.executorCpuTime / 1e9}%8.2fs ${si.name.take(80)}")
        }
      })
    }
    // warm-up: session/codegen/scan initialization must not be charged to
    // whichever query happens to run first
    spark.range(1000000L).selectExpr("sum(id)").collect()
    new java.io.File(sfDir).listFiles((_, n) => n.endsWith(".parquet"))
      .foreach(f => spark.read.parquet(f.getPath).count())
    // sorted order: deterministic run sequence so per-query numbers are
    // comparable across rounds (Map iteration order is arbitrary)
    // 5 runs by default: r4's noise adjudication leaned on queries_min,
    // and 3 runs can all land inside one co-tenant load burst (the r4
    // merge-family false alarm did exactly that)
    val runsPerQuery = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    require(runsPerQuery >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $runsPerQuery")
    // optional comma-separated filter for iterating on single queries
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    // CPU-bound CALIBRATION probe: a fixed integer kernel — no I/O, no
    // shuffle beyond the one-row final agg, no data dependence — recorded
    // in every bench run so cross-round comparisons can DIVIDE OUT the
    // box's momentary speed (co-tenant load) instead of inferring it from
    // the ratio distribution (the r12 verdict had to reconstruct a 1.21×
    // box factor that way). Not a SparkEntry gate (nothing to oracle);
    // excluded from "total" so round totals stay comparable.
    import org.apache.spark.sql.functions.{col, expr, xxhash64}
    val calibration: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, _) => s.range(0L, 1L << 30, 1L, s.sparkContext.defaultParallelism)
        .select(xxhash64(col("id")).as("_h"))
        .select(expr("bit_xor(_h)").as("h")) // xor-fold: no ANSI overflow
    val selected =
      (Seq("calibration_cpu" -> calibration) ++ SparkEntry.queries.toSeq.sortBy(_._1))
        .filter { case (n, _) => only.forall(_.contains(n)) }
    // BLOCK-interleaved runs: each query runs in TWO separated
    // consecutive blocks (ceil(N/2) then floor(N/2) runs) rather than
    // one N-run burst or full per-run interleaving. Rationale, measured:
    // a co-tenant load burst can cover all N consecutive runs of one
    // query (the r4/r5 false-regression mode), but full round-robin
    // poisons the per-query MIN — every revisit pays cold CPU caches and
    // the session state the other 70+ queries accumulated between visits
    // (2× on short shuffle-light queries like ngram_jaccard_pairs).
    // Two blocks keep a warm consecutive run in every query's sample
    // (the min floor survives) while a burst can no longer cover both.
    val times = Array.fill(selected.length)(Vector.empty[Double])
    val gcMs = Array.fill(selected.length)(Vector.empty[Long])
    val failed = Array.fill(selected.length)(false)
    // per-run GC wall time (all collectors, this JVM): the r10 verdict's
    // merge_addtoset_structs anomaly (min 2s / median 24s) was unreadable
    // from three summary stats — per-run times + GC make every future
    // burst self-adjudicating (high time + high GC = heap/co-tenant
    // pressure; high time + flat GC = the plan itself)
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime.max(0L)).sum
    val blocks = Seq(runsPerQuery - runsPerQuery / 2, runsPerQuery / 2).filter(_ > 0)
    // PROBE TIMELINE (r14 lesson: one probe per sweep made a loaded
    // closing box unadjudicable — a mid-sweep burst could not be
    // attributed to the queries it covered). Every `probeEvery` queries
    // within each block, one extra calibration-kernel sample records
    // (block, last query completed, seconds): a reader maps any
    // per-query inflation to the box speed AT THAT POINT in the sweep.
    // ~12 samples/block on the full suite ≈ +3 s — negligible.
    val probeEvery = sys.env.getOrElse("SPARK_GRAFT_BENCH_PROBE_EVERY", "25").toInt
    val probeTimeline = scala.collection.mutable.ListBuffer.empty[(Int, String, Double)]
    for ((blockRuns, bi) <- blocks.zipWithIndex; i <- selected.indices) {
      for (_ <- 0 until blockRuns) {
        val (name, fn) = selected(i)
        val g0 = gcMillis()
        val t0 = System.nanoTime()
        // noop write forces full evaluation of every output column — a bare
        // .count() lets Catalyst prune projections and EliminateSorts drop
        // sorts, benchmarking narrow queries as little more than a scan
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case e: Throwable =>
          // a failed query must not score as a plausible-looking time
          failed(i) = true
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        times(i) :+= (System.nanoTime() - t0) / 1e9
        gcMs(i) :+= gcMillis() - g0
      }
      if (probeEvery > 0 && i % probeEvery == probeEvery - 1) {
        val t0 = System.nanoTime()
        try calibration(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => () }
        probeTimeline += ((bi + 1, selected(i)._1, (System.nanoTime() - t0) / 1e9))
      }
    }
    // median of N runs: single-shot numbers carry JIT/GC noise that made
    // round-over-round per-query deltas untrustworthy. min is recorded
    // alongside so cross-round comparisons can split machine noise from
    // real regressions without a re-run (min is the low-noise floor).
    // p25 sits between them: with 5 runs the min is ONE sample, so a
    // lucky (or load-burst-free) outlier can move it alone — p25 (the
    // second-lowest at n=5) needs two concordant samples, letting a
    // flagged round self-adjudicate bursts without a judge re-run
    val results = selected.indices.map { i =>
      val ts = times(i).sorted
      (selected(i)._1, ts(ts.length / 2), ts.head, ts((ts.length - 1) / 4), failed(i))
    }
    val ok = results.filterNot(_._5)
    def jmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // failed queries report null (never a fake elapsed time) and are listed
    // by name; total covers only successful queries
    val qs = results.map { case (k, med, _, _, f) =>
      s"\"" + k + "\":" + (if (f) "null" else med.toString)
    }.mkString("{", ",", "}")
    val mins = jmap(ok.map(r => r._1 -> r._3))
    val p25s = jmap(ok.map(r => r._1 -> r._4))
    // raw per-run arrays IN RUN ORDER (block 1 then block 2), so a reader
    // can see whether a slow median is one covered block (co-tenant burst)
    // or spread across both (plan/heap); GC wall ms per run alongside
    def jarr(f: Int => String): String = selected.indices.map { i =>
      "\"" + selected(i)._1 + "\":[" + f(i) + "]"
    }.mkString("{", ",", "}")
    val runsJson = jarr(i => times(i).map(t => f"$t%.3f").mkString(","))
    val gcJson = jarr(i => gcMs(i).mkString(","))
    val failedNames = results.filter(_._5).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val okGated = ok.filterNot(_._1 == "calibration_cpu")
    val total = if (okGated.nonEmpty) okGated.map(_._2).sum else 0.0
    // [block, last-query-completed, probe seconds] in sweep order
    val probeJson = probeTimeline.map { case (b, n, t) =>
      f"""[$b,"$n",$t%.3f]"""
    }.mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs""" +
      s""","queries_min":$mins,"queries_p25":$p25s,"queries_runs":$runsJson""" +
      s""","queries_gc_ms":$gcJson,"failed_queries":$failedNames""" +
      s""","probe_timeline":$probeJson""" +
      s""","runs_per_query":$runsPerQuery,"stat":"median","interleaved":"two-block","sf":"$sfDir"}"""
    println(line)
    // belt-and-braces: also persist the JSON where the driver can read it
    // even if stdout is decorated by the launcher
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
