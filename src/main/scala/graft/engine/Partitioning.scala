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
    * would throw on an unstarted streaming plan, and a micro-batch's
    * parallelism is the source's to decide — so the helper is a no-op
    * there rather than a constraint.
    *
    * The parallelism probe prefers FILE STATISTICS over `df.rdd`: when
    * every leaf is a file relation, the split count is estimated from
    * (total bytes, file count) with Spark's own maxSplitBytes formula —
    * logical-plan metadata only, no separate non-AQE physical planning
    * of the whole query per call (which `df.rdd` forces). Non-file leaves
    * (literal/local test data) fall back to `df.rdd`, where planning is
    * as cheap as the data.
    */
  def spreadByKey(df: DataFrame, key: Column): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (scanParallelism(df) < target) df.repartition(key) else df
  }

  /** Estimated scan parallelism. File-backed plans replicate
    * `FilePartition.maxSplitBytes` bin-packing arithmetic: splits ≈
    * ceil((bytes + openCost·files) / maxSplitBytes) with maxSplitBytes =
    * min(maxPartitionBytes, max(openCost, perCore share)). The estimate
    * can exceed the real split count when row groups are unsplittable
    * (small local files) — conservative in the right direction: both
    * sides of the comparison are then "starved", and the repartition
    * fires exactly as before.
    *
    * CONTRACT: the stats come from the relation's WHOLE file listing —
    * partition pruning and pushed filters in `df`'s own plan are not
    * subtracted, so a heavily pruned scan is overestimated and
    * [[spreadByKey]] may skip a repartition the pruned input would have
    * wanted (perf-only: work still distributes over the real splits).
    * Call it on unpruned base scans — the shape of every current call
    * site (the Dedup/text pipeline heads, which scan the full corpus).
    * `location.inputFiles` also forces a file listing per call; fine for
    * pipeline heads, not for per-batch loops.
    */
  private def scanParallelism(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    val fsRels = leaves.collect {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        l.relation.asInstanceOf[HadoopFsRelation]
    }
    if (fsRels.nonEmpty && fsRels.size == leaves.size) {
      val conf = df.sparkSession.sessionState.conf
      val openCost = conf.filesOpenCostInBytes
      val defaultParallelism = df.sparkSession.sparkContext.defaultParallelism
      val totalBytes = fsRels.map(r =>
        r.location.sizeInBytes + openCost * math.max(1, r.location.inputFiles.length)).sum
      val maxSplit = math.min(conf.filesMaxPartitionBytes,
        math.max(openCost, totalBytes / defaultParallelism))
      math.max(1, math.ceil(totalBytes.toDouble / maxSplit).toInt)
    } else df.rdd.getNumPartitions
  }

  /** Salted equi-join for skewed keys: a hot join key concentrates its
    * rows in one shuffle partition and serializes the join on one task;
    * salting splits each key into `salts` sub-keys — the big side salts
    * each row deterministically (hash of the full row, so identical
    * reruns salt identically and the result is reproducible), the small
    * side replicates `salts`× — and the join runs on (keys, salt) with
    * the hot key's rows spread over `salts` tasks. The result multiset
    * is EXACTLY the unsalted join's (each (big, small) row pair meets on
    * precisely one salt value; spec-pinned).
    *
    * Use when a specific key set is known-hot and AQE's skew-join
    * splitting can't kick in (e.g. the shuffle feeding a user-origin
    * repartition, or pre-AQE engines). Cost: small side ×`salts`
    * (keep it broadcast-small or salts modest). Inner and left_outer
    * only: right/full outer would duplicate unmatched small rows across
    * salts.
    *
    * NOTE: rows that are fully identical on the big side share a salt
    * (the hash is deterministic), so a hot key whose rows are all
    * IDENTICAL stays skewed — that shape is exact-duplicate data and
    * wants deduplication, not a join trick.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    require(salts > 0, s"salts must be positive, got $salts")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left_outer, got $joinType")
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts.toLong)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    bigS.join(smallS, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Semi-join reduction via a deterministic Bloom filter — the join
    * remedy for the middle regime `saltedJoin` and `broadcast()` don't
    * cover: the dim side is too big to broadcast as rows, the fact side
    * is huge, and most fact rows DON'T join (selective dim predicate).
    * Build: the dim keys' probe positions (graft.plans
    * .BloomProbePositions) are exploded and distinct-collected — the
    * collected set is bounded by `mBits` (the filter size YOU chose to
    * fit in memory), never by the dim row count. Probe: the fact side
    * filters with the identical probe math (graft.plans
    * .BloomMightContain) BEFORE its exchange, so rows that cannot join
    * never shuffle. The exact inner join then removes false positives;
    * false negatives are impossible, so the RESULT is bit-identical to
    * `fact.join(dim, ...)` — the Bloom stage buys only I/O, which is
    * why the gate oracle is the plain join.
    *
    * Keys must be BIGINT-castable (ids). Null fact keys drop (inner
    * join semantics). `mBits` sizing: ~10 bits/key gives ~1% false
    * positives with k=7 — at 10⁸ dim keys that is a 125 MB bitset where
    * the dim ROWS would be tens of GB.
    */
  def bloomSemiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      mBits: Int = 1 << 20,
      k: Int = 7
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    val filtered = fact.filter(bloomKeep(dim, dimKey, col(factKey), mBits, k))
    filtered.join(dim, filtered(factKey) === dim(dimKey))
  }

  /** The probe side of [[bloomSemiJoin]] on its own: a boolean Column
    * over `probeKey` that is true for every key present in
    * `dim.dimKey` (and, at the filter's false-positive rate, for some
    * that aren't). Exposed separately so a pipeline can reuse one built
    * filter across several fact scans.
    */
  def bloomKeep(
      dim: DataFrame,
      dimKey: String,
      probeKey: Column,
      mBits: Int,
      k: Int
  ): Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.ColumnBridge
    import graft.plans.{BloomMightContain, BloomProbePositions}
    val posCol = ColumnBridge.column(BloomProbePositions(
      ColumnBridge.expression(col(dimKey).cast("long")), mBits, k))
    val positions = dim.select(explode(posCol).as("_p"))
      .distinct()
      .collect()
      .map(_.getInt(0))
    val words = new Array[Long]((mBits + 63) / 64)
    positions.foreach(p => words(p >>> 6) |= (1L << (p & 63)))
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(probeKey.cast("long")), words, mBits, k))
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
