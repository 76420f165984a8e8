package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Range (interval) join — the second temporal primitive Spark lacks
 * natively (alongside [[AsOf]]): match points to the intervals that
 * contain them, or two interval sets by overlap, WITHOUT the
 * non-equi-join trap. A naive `p >= s AND p <= e` predicate gives
 * Catalyst no equality to hash or sort on, so the planner falls back to
 * BroadcastNestedLoopJoin (or a cartesian) — O(|A|·|B|) per key and the
 * first thing that dies at scale.
 *
 * Spark-first shape — bucketize the numeric domain so the range
 * predicate becomes an EQUALITY on the bucket id: each interval explodes
 * to the buckets it covers (span/width + 1 rows), each point maps to
 * exactly ONE bucket, and the join runs as a plain shuffled hash/merge
 * join on `(keys..., bucket)` with the exact range predicate left in as
 * a post-join filter. Catalyst sees an equi-join, so every machine-scale
 * strategy (shuffle hash, sort-merge, AQE skew split) applies; the
 * explode factor is bounded by `ceil(span / bucketWidth) + 1` per
 * interval, and a point lands in one bucket so no dedup is needed —
 * every qualifying (point, interval) pair is emitted exactly once.
 *
 * Interval×interval overlap uses the same trick plus the
 * first-common-bucket rule: an overlapping pair shares every bucket in
 * the overlap region, so emitting it ONLY at `max(startBucketA,
 * startBucketB)` — a bucket both sides necessarily cover when they
 * overlap — makes each pair match on exactly one bucket value, again
 * with no `distinct()` pass over the pair stream.
 *
 * `bucketWidth` tuning: pick it near the TYPICAL interval span — much
 * smaller multiplies the interval explode; much larger piles unrelated
 * rows into shared buckets and pushes work into the post-filter. Both
 * extremes stay correct (a spec pins bucket-width invariance); only the
 * constant factor moves. Columns are caller-converted to LONG (epoch
 * days/seconds/micros — see the gate, which joins on day numbers) so
 * one operator covers timestamps, numeric ranges, and IP blocks alike.
 *
 * Reference anchor: the NiFi bundle routes each record through
 * date-range bins one record at a time (`DataBinningProcessor.java:
 * 241-306` evaluates every bin config against every record). This is
 * that capability as a set-oriented join, generalized to arbitrary
 * interval tables.
 */
object RangeJoin {

  /** Exact floor division for longs of any sign: `c - pmod(c, w)` is
    * always an exact multiple of `w` (`pmod` is non-negative), and the
    * quotient is taken with integer `div` (IntegralDivide) — NOT Column
    * `/`, which is double division and silently rounds past 2^53
    * (epoch-nanos domains live there). Truncation direction is
    * irrelevant because the remainder is zero.
    */
  private def bucketOf(c: Column, w: Long): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    val multiple = (c - pmod(c, lit(w))).cast(LongType)
    ColumnBridge.column(
      IntegralDivide(ColumnBridge.expression(multiple), Literal(w))
    ).cast(LongType)
  }

  /** Inner-join `points` to every interval containing them (inclusive
    * bounds): output = all point columns + all interval columns (caller
    * ensures disjoint names). Rows with a null point, bound, or key are
    * dropped (inner-join semantics). `keys` may be empty (pure range
    * join — the shuffle key is then the bucket alone).
    *
    * `broadcastLongSpans`: with a heavy-tailed span distribution (a few
    * year-long intervals among millions of minute-long ones), intervals
    * spanning ≥ this many buckets are pulled out of the bucketed path
    * and joined by a broadcast range predicate instead — the explode of
    * a huge interval is avoided entirely when such intervals are RARE.
    * The caller asserts rarity (the long side is broadcast verbatim; a
    * long tail that is actually large belongs in the bucketed path,
    * whose explode is then the inherent work, so the default keeps
    * everything bucketed).
    */
  def joinPointInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      keys: Seq[String] = Seq.empty,
      broadcastLongSpans: Option[Long] = None
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val s = col(startCol)
    val e = col(endCol)
    val valid = intervals.filter(s.isNotNull && e.isNotNull && e >= s)
    val spanBuckets = bucketOf(e, bucketWidth) - bucketOf(s, bucketWidth) + 1

    val (bucketed, longTail) = broadcastLongSpans match {
      case Some(cap) =>
        (valid.filter(spanBuckets < cap), Some(valid.filter(spanBuckets >= cap)))
      case None => (valid, None)
    }

    val p = points.withColumn("_rj_bucket", bucketOf(col(pointCol), bucketWidth))
    val exploded = bucketed.withColumn(
      "_rj_bucket",
      explode(sequence(bucketOf(s, bucketWidth), bucketOf(e, bucketWidth))))
    val onBucket = p.join(exploded, keys :+ "_rj_bucket")
      .filter(col(pointCol) >= s && col(pointCol) <= e)
      .drop("_rj_bucket")

    longTail match {
      case Some(lt) =>
        val cond = keys.map(k => points(k) === lt(k))
          .reduceOption(_ && _).getOrElse(lit(true)) &&
          points(pointCol) >= lt(startCol) && points(pointCol) <= lt(endCol)
        // The using-columns join above coalesces each key into one
        // column; mirror that here by dropping the interval-side copies.
        val viaBroadcast = keys.foldLeft(points.join(broadcast(lt), cond)) {
          (d, k) => d.drop(lt(k))
        }
        onBucket.unionByName(viaBroadcast)
      case None => onBucket
    }
  }

  /** Inner-join two interval tables on overlap (inclusive:
    * `aStart <= bEnd AND bStart <= aEnd`), each overlapping pair emitted
    * exactly once via the first-common-bucket rule. Output = all `a`
    * columns + all `b` columns (caller ensures disjoint names).
    */
  def joinIntervalOverlap(
      a: DataFrame,
      aStartCol: String,
      aEndCol: String,
      b: DataFrame,
      bStartCol: String,
      bEndCol: String,
      bucketWidth: Long,
      keys: Seq[String] = Seq.empty
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def explodeSide(df: DataFrame, sc: String, ec: String): DataFrame =
      df.filter(col(sc).isNotNull && col(ec).isNotNull && col(ec) >= col(sc))
        .withColumn("_rj_bucket",
          explode(sequence(bucketOf(col(sc), bucketWidth), bucketOf(col(ec), bucketWidth))))
    val ea = explodeSide(a, aStartCol, aEndCol)
    val eb = explodeSide(b, bStartCol, bEndCol)
    ea.join(eb, keys :+ "_rj_bucket")
      .filter(
        col(aStartCol) <= col(bEndCol) && col(bStartCol) <= col(aEndCol) &&
          col("_rj_bucket") === greatest(
            bucketOf(col(aStartCol), bucketWidth),
            bucketOf(col(bStartCol), bucketWidth)))
      .drop("_rj_bucket")
  }
}
