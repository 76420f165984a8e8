package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional third arg (local iteration only; the driver passes two):
    // comma-separated query names — run just those, dump all oracles
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
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
    new java.io.File(outDir).mkdirs()
    // fail FAST and LOUDLY on testdata schema drift — in round 7 a
    // regenerated events.parquet silently dropped 22 queries from the
    // correctness report (each threw at plan time, was caught below,
    // and simply never produced a result directory)
    TableSchemas.check(spark, sfDir)
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    var ok = 0
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        ok += 1
      } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // one unmissable summary line — a plan-time breakage must never
    // again read as "queries disappeared"
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] SUMMARY: $ok ok, ${failed.size} FAILED: ${failed.sorted.mkString(", ")}")
    else
      System.err.println(s"[verify] SUMMARY: $ok ok, 0 failed")
    // probe honesty: the two hash-divergence tripwires are expected RED
    // at the driver and NOTHING else is — print the contract every run
    // so a differing red set in CORRECTNESS_r*.json is read as a driver
    // behavior change, never as noise. Also assert the probes still
    // probe: decimal_probe_dec must emit DECIMAL, hugeint_probe's
    // oracle must keep its sum() UNCAST (HUGEINT) — a probe that
    // drifted to BIGINT on both sides would go green silently.
    SparkEntry.expectedRedProbes.keys.foreach { name =>
      require(SparkEntry.queries.contains(name) &&
        SparkEntry.oracleSql.contains(name),
        s"[verify] probe $name vanished — the expected-red contract is broken")
    }
    if (only.isEmpty || only.exists(_.contains("decimal_probe_dec"))) {
      val decType = spark.read.parquet(s"$outDir/decimal_probe_dec")
        .schema("dec_val").dataType
      require(decType.isInstanceOf[org.apache.spark.sql.types.DecimalType],
        s"[verify] decimal_probe_dec emits $decType, not DECIMAL — it no longer probes the driver's DECIMAL hashing")
    }
    require(SparkEntry.oracleSql("hugeint_probe").contains("sum(v) AS sum_v"),
      "[verify] hugeint_probe oracle no longer emits the UNCAST sum(v) " +
        "(HUGEINT) — it no longer probes the driver's HUGEINT hashing")
    System.err.println("[verify] probes: expected-red = " +
      SparkEntry.expectedRedProbes.keys.toSeq.sorted.mkString(", ") +
      " — every other query expected GREEN; a different red set means the driver's hashing changed")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
