package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // events.parquet carries TIMESTAMP(NANOS) (see SparkEntry.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // byte-based AQE coalescing under-parallelizes CPU-heavy text stages
      // on small local files; 16k floor keeps them spread across cores
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      // InferFiltersFromGenerate clones the full generator-input expression
      // tree (regex tokenization) into a scan-level filter — pure overhead
      // for our explode pipelines, whose generators drop nothing
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: session/codegen/scan initialization must not be charged to
    // whichever query happens to run first
    spark.range(1000000L).selectExpr("sum(id)").collect()
    new java.io.File(sfDir).listFiles((_, n) => n.endsWith(".parquet"))
      .foreach(f => spark.read.parquet(f.getPath).count())
    // sorted order: deterministic run sequence so per-query numbers are
    // comparable across rounds (Map iteration order is arbitrary)
    val runsPerQuery = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(runsPerQuery >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $runsPerQuery")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // median of N runs: single-shot numbers carry JIT/GC noise that made
      // round-over-round per-query deltas untrustworthy
      val times = (0 until runsPerQuery).map { _ =>
        val t0 = System.nanoTime()
        // noop write forces full evaluation of every output column — a bare
        // .count() lets Catalyst prune projections and EliminateSorts drop
        // sorts, benchmarking narrow queries as little more than a scan
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case e: Throwable =>
          // a failed query must not silently score as near-zero seconds
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs""" +
      s""","runs_per_query":$runsPerQuery,"stat":"median","sf":"$sfDir"}"""
    println(line)
    // belt-and-braces: also persist the JSON where the driver can read it
    // even if stdout is decorated by the launcher
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
