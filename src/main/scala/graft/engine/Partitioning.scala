package graft.engine

import org.apache.spark.sql.{Column, DataFrame}

/**
 * Parallelism helpers for CPU-heavy pipeline heads.
 *
 * Local/small-file reality: parquet row groups are unsplittable, so a
 * 1.5 MB documents file arrives as ONE input partition and a regex-heavy
 * map stage serializes on one core. At 100 TB the opposite holds: input
 * splits outnumber cores and a pipeline-head `repartition` is a full
 * payload shuffle bought for nothing.
 *
 * [[spreadByKey]] resolves the tension by looking at the ACTUAL scan
 * parallelism: it repartitions only when the input has fewer partitions
 * than the session's default parallelism — a no-op exactly where the
 * shuffle would be a scale bug.
 */
object Partitioning {

  /** Hash-repartition `df` by `key` IFF its scan parallelism is below the
    * session default — local small files get their CPU spread, big inputs
    * keep their splits and pay no shuffle.
    *
    * Streaming DataFrames pass through unchanged: the partition probe
    * (`df.rdd`) would throw on an unstarted streaming plan, and a
    * micro-batch's parallelism is the source's to decide — so the helper
    * is a no-op there rather than a constraint.
    */
  def spreadByKey(df: DataFrame, key: Column): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(key) else df
  }

  /** Persist `df` as a BUCKETED (and bucket-sorted) parquet table: every
    * later equi-join or aggregation on `keys` between tables bucketed the
    * same way is exchange-free — the co-located-join contract for state
    * tables that are merged every batch (write the shuffle once, reuse it
    * every read). Bucket pruning also applies to point lookups on the
    * bucket keys. `PlanShapeSpec` asserts the no-Exchange join plan.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      keys: Seq[String],
      numBuckets: Int
  ): Unit = {
    require(keys.nonEmpty, "bucketed write requires at least one key")
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
