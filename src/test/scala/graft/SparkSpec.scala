package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all suites (sbt runs suites in one forked
  * JVM; a session per suite would dominate test time).
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  import org.apache.spark.sql.DataFrame

  /** Collect a DataFrame to a sorted Seq of row-value lists for stable
    * comparison.
    */
  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  /** Shuffle Exchange nodes of a query's physical plan, unwrapping the
    * AQE root (AdaptiveSparkPlanExec reports no children to `collect`,
    * so a naive collect over executedPlan is VACUOUSLY empty; its
    * `inputPlan` predates EnsureRequirements and has no Exchanges yet —
    * `initialPlan` is the first plan that does).
    */
  def shuffleExchanges(df: DataFrame)
      : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] = {
    val root = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    root.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
  }
}
