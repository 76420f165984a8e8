package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Dataset profiling — the "know your data" pass a training pipeline runs
 * before committing 100 TB to a mix: per-column counts, null counts,
 * range, mean, and exact quartiles/p90.
 *
 * Shape: ONE stacked scan unpivots the columns to (col_name, value)
 * rows, a distributed hash aggregate compresses them to a value
 * HISTOGRAM (map-side partial combine — the only pass over the data),
 * moments reduce over the histogram in parallel, and exact percentiles
 * come from DISTRIBUTED SELECTION over it: range-bucket the histogram,
 * locate each target rank's bucket from driver-side cumulative bucket
 * totals (≤ `buckets` rows of metadata per column), and sort only the
 * few buckets that contain ranks. No stage ever funnels a column's
 * whole value set into one task — per-task work is bounded by
 * max(|histogram partition|, |one bucket's distinct values|), and a
 * pathological bucket re-buckets recursively (each level divides the
 * value RANGE by `buckets`, so depth is log_buckets of the range/gap
 * ratio — ≤ 2 on real data). This is what keeps the exact family
 * viable on continuous columns at 100×, where the old single-reduce
 * `percentile(v, p, cnt)` final merge (memory and time ∝ |distinct
 * values|) was the documented scale ceiling.
 *
 * Determinism across engines (oracle-gated, not approximate): means
 * accumulate in DECIMAL (a double sum depends on reduction order);
 * selection reproduces Spark `percentile`'s interpolation arithmetic
 * bit-for-bit ([[interpolateRanks]]), which in turn is value-identical
 * to DuckDB's `quantile_cont` — verified on the driver gates.
 */
object Profile {

  /** Largest measured per-group row count for which
    * [[rankCorrelationByGroup]] assigns ranks with a plain per-group
    * `row_number` window (one task sorts ≤ this many 32-byte rows —
    * cheap, and half the stage count of the two-level path); above it
    * the [[graft.operators.Sampling.withinGroupRanks]] bucketed prefix
    * takes over so no task ever sorts a whole group. Exposed for specs
    * via the operator's `rankWindowThreshold` parameter.
    */
  private val RankWindowThreshold: Long = 1L << 22

  /** Per-group metadata the selection needs: total non-null count,
    * distinct non-null value count, and the value range.
    */
  private case class GroupStats(n: Long, distinct: Long, mn: Double, mx: Double)

  /** Exact order statistics per group over a `(g, v, cnt)` value
    * histogram (v non-null) — distributed selection by iterative range
    * narrowing. Returns the value at each requested 0-based rank.
    *
    * Level 1 is BATCHED across groups: one bucket-totals aggregate
    * (per-group range bucketing via a literal when-chain — groups are
    * few by construction: profiled columns), one driver pass over the
    * ≤ groups·buckets totals to locate ranks, one batched collect of
    * every rank-bearing bucket small enough to sort directly. Oversized
    * buckets (value mass concentrated in 1/buckets of the range)
    * recurse individually — each level shrinks the candidate range by
    * `buckets`×, so termination is immediate in practice and guaranteed
    * in general (a width-0 or sub-threshold slice sorts directly).
    * Driver memory is bounded by `directThreshold` values per collected
    * bucket plus the bucket-totals metadata — never a column's full
    * distinct set.
    */
  private def groupedOrderStats(
      hist: DataFrame,
      stats: Map[String, GroupStats],
      ranks: Map[String, Seq[Long]],
      buckets: Int = 1024,
      directThreshold: Long = 1L << 16
  ): Map[(String, Long), Double] = {
    val spark = hist.sparkSession
    val out = scala.collection.mutable.Map.empty[(String, Long), Double]

    // pick ranked values out of one group's ascending (v, cnt) run
    def pick(g: String, rows: Iterator[(Double, Long)], offset: Long,
        rs: Seq[Long]): Unit = {
      val targets = rs.sorted.iterator
      if (!targets.hasNext) return
      var target = targets.next()
      var done = false
      var cum = offset
      while (!done && rows.hasNext) {
        val (v, cnt) = rows.next()
        cum += cnt
        while (!done && target < cum) {
          out += (g, target) -> v
          if (targets.hasNext) target = targets.next() else done = true
        }
      }
    }

    // recursive narrow over ONE group's sub-histogram (rare past level 1)
    def narrow(g: String, h: DataFrame, rs: Seq[Long], offset: Long,
        distinct: Long, mn: Double, mx: Double): Unit = {
      val width = (mx - mn) / buckets
      if (distinct <= directThreshold || !(width > 0)) {
        // driver-side sort: the slice is ≤ directThreshold rows, so
        // sorting locally beats a range-partitioned engine sort job
        pick(g, h.select("v", "cnt").collect()
          .map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1).iterator,
          offset, rs)
      } else {
        val bin = least(floor((col("v") - lit(mn)) / lit(width)),
          lit(buckets - 1L)).cast(LongType)
        val totals = h.groupBy(bin.as("_b"))
          .agg(sum(col("cnt")).as("_n"), count(lit(1)).as("_d"),
            min(col("v")).as("_mn"), max(col("v")).as("_mx"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4)))
          .sortBy(_._1)
        var cum = offset
        val located = totals.map { case (b, n, d, bmn, bmx) =>
          val start = cum; cum += n; (b, start, n, d, bmn, bmx)
        }
        for ((b, start, n, d, bmn, bmx) <- located) {
          val mine = rs.filter(r => r >= start && r < start + n)
          if (mine.nonEmpty)
            narrow(g, h.filter(bin === b), mine, start, d, bmn, bmx)
        }
      }
    }

    val active = ranks.toSeq
      .map { case (g, rs) => g -> rs.distinct }
      .filter { case (g, rs) => rs.nonEmpty && stats.contains(g) }
    if (active.isEmpty) return Map.empty

    // groups that sort directly vs groups that bucket
    val (direct, binned) = active.partition { case (g, _) =>
      val s = stats(g)
      s.distinct <= directThreshold || !((s.mx - s.mn) / buckets > 0)
    }
    if (direct.nonEmpty) {
      // batched: one collect covers every direct group
      val directRows = hist.filter(col("g").isin(direct.map(_._1): _*))
        .select("g", "v", "cnt").collect()
        .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2))))
        .groupBy(_._1)
      for ((g, rs) <- direct)
        pick(g, directRows.getOrElse(g, Array.empty[(String, (Double, Long))])
          .map(_._2).sortBy(_._1).iterator, 0L, rs)
    }

    if (binned.nonEmpty) {
      // level-1 bucket assignment for ALL binned groups in one pass:
      // per-group (mn, width) as literal CASE arms keyed on g (groups
      // are few by construction — profiled columns)
      val mnExpr = coalesce(binned.map { case (g, _) =>
        when(col("g") === g, lit(stats(g).mn)) }: _*)
      val widthExpr = coalesce(binned.map { case (g, _) =>
        when(col("g") === g, lit((stats(g).mx - stats(g).mn) / buckets))
      }: _*)
      val bin = least(floor((col("v") - mnExpr) / widthExpr),
        lit(buckets - 1L)).cast(LongType)
      val gSet = binned.map(_._1)
      val lvl1 = hist.filter(col("g").isin(gSet: _*))
        .groupBy(col("g"), bin.as("_b"))
        .agg(sum(col("cnt")).as("_n"), count(lit(1)).as("_d"),
          min(col("v")).as("_mn"), max(col("v")).as("_mx"))
        .collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))))
        .groupBy(_._1).map { case (g, rows) => g -> rows.map(_._2).sortBy(_._1) }
      // locate each rank's bucket from cumulative totals (driver metadata)
      case class Need(g: String, b: Long, start: Long, d: Long,
          mn: Double, mx: Double, rs: Seq[Long])
      val needs = binned.flatMap { case (g, rs) =>
        var cum = 0L
        lvl1(g).flatMap { case (b, n, d, bmn, bmx) =>
          val start = cum; cum += n
          val mine = rs.filter(r => r >= start && r < start + n)
          if (mine.nonEmpty) Some(Need(g, b, start, d, bmn, bmx, mine)) else None
        }
      }
      val (small, large) = needs.partition(_.d <= directThreshold)
      if (small.nonEmpty) {
        // ONE batched collect of every small rank-bearing bucket,
        // sorted driver-side (each bucket ≤ directThreshold values)
        val keep = small.map(n => col("g") === n.g && bin === n.b)
          .reduce(_ || _)
        val rows = hist.filter(col("g").isin(gSet: _*)).filter(keep)
          .select(col("g"), bin.as("_b"), col("v"), col("cnt")).collect()
          .map(r => ((r.getString(0), r.getLong(1)), (r.getDouble(2), r.getLong(3))))
          .groupBy(_._1)
        for (n <- small) {
          require(rows.contains((n.g, n.b)),
            "selection invariant violated: a located bucket vanished")
          pick(n.g, rows((n.g, n.b)).map(_._2).sortBy(_._1).iterator,
            n.start, n.rs)
        }
      }
      for (n <- large)
        narrow(n.g, hist.filter(col("g") === n.g && bin === n.b),
          n.rs, n.start, n.d, n.mn, n.mx)
    }
    out.toMap
  }

  /** Reproduce Spark `percentile`'s linear interpolation BIT-FOR-BIT
    * from order statistics: position = (n−1)·p (long × double), value =
    * (⌈pos⌉ − pos)·v⌊pos⌋ + (pos − ⌊pos⌋)·v⌈pos⌉, with the two no-op
    * short-circuits. Keeping the arithmetic identical to the engine
    * aggregate (and thus to DuckDB's `quantile_cont`, verified on the
    * driver gates) is what lets selection replace the aggregate without
    * moving a single compared decimal.
    */
  private def interpolateRanks(
      n: Long, probs: Seq[Double], at: Long => Double): Seq[Double] = {
    val maxPosition = n - 1
    probs.map { p =>
      val position = maxPosition * p
      val lower = math.floor(position).toLong
      val higher = math.ceil(position).toLong
      val lowerKey = at(lower)
      if (higher == lower) lowerKey
      else {
        val higherKey = at(higher)
        if (higherKey == lowerKey) lowerKey
        else (higher - position) * lowerKey + (position - lower) * higherKey
      }
    }
  }

  /** The 0-based ranks [[interpolateRanks]] will ask for. */
  private def ranksFor(n: Long, probs: Seq[Double]): Seq[Long] = {
    val maxPosition = n - 1
    probs.flatMap { p =>
      val position = maxPosition * p
      Seq(math.floor(position).toLong, math.ceil(position).toLong)
    }.distinct
  }

  /** Numeric profile of `cols` (must be castable to double): one row per
    * column — (col_name, n non-null, nulls, min, max, mean, p25, p50,
    * p75, p90). `sumScale` is the DECIMAL scale for the mean
    * accumulator; keep it at or above the data's decimal places so the
    * cast is exact.
    */
  def numeric(df: DataFrame, cols: Seq[String], sumScale: Int = 2): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val spark = df.sparkSession
    val dec = DecimalType(38, sumScale)
    val probs = Seq(0.25, 0.5, 0.75, 0.9)
    val stacked = df.selectExpr(
      s"stack(${cols.length}, " +
        cols.map(c => s"'$c', CAST($c AS DOUBLE)").mkString(", ") +
        ") AS (g, v)")
    // the ONE pass over the data — materialized because moments, bucket
    // totals and the rank-bearing bucket collects all reduce over it
    val hist = stacked.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val moments = hist.groupBy(col("g"))
      .agg(
        sum(when(col("v").isNotNull, col("cnt")).otherwise(0L)).as("n"),
        sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("nulls"),
        // distincts are FREE here: the first stage is a value histogram,
        // so exact cardinality is just its non-null row count — no
        // second count(DISTINCT) expansion of the scan
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
        min(col("v")).as("min"),
        max(col("v")).as("max"),
        sum(col("v").cast(dec) * col("cnt")).as("sm"))
      .collect()
      .map(r => r.getString(0) -> r).toMap
    val nonNull = hist.filter(col("v").isNotNull)
    val stats = moments.collect { case (g, r) if r.getLong(1) > 0 =>
      g -> GroupStats(r.getLong(1), r.getLong(3), r.getDouble(4), r.getDouble(5))
    }
    val ranks = stats.map { case (g, s) => g -> ranksFor(s.n, probs) }
    val sel = groupedOrderStats(nonNull, stats, ranks)
    // assemble driver-side: the profile is ≤ #cols rows of metadata.
    // mean replicates the old engine arithmetic exactly — decimal sum
    // → double cast → double/long divide
    val rows: Seq[org.apache.spark.sql.Row] =
      moments.keys.toSeq.sorted.map { g =>
        val r = moments(g)
        val n = r.getLong(1)
        if (n == 0L)
          org.apache.spark.sql.Row(g, n, r.getLong(2), r.getLong(3),
            null, null, null, null, null, null, null)
        else {
          val ps = interpolateRanks(n, probs, rk => sel((g, rk)))
          val mean = r.getDecimal(6).doubleValue() / n
          org.apache.spark.sql.Row(g, n, r.getLong(2), r.getLong(3),
            r.getDouble(4), r.getDouble(5), mean, ps(0), ps(1), ps(2), ps(3))
        }
      }
    val schema = StructType(Seq(
      StructField("col_name", StringType),
      StructField("n", LongType),
      StructField("nulls", LongType),
      StructField("n_distinct", LongType, nullable = false),
      StructField("min", DoubleType),
      StructField("max", DoubleType),
      StructField("mean", DoubleType),
      StructField("p25", DoubleType),
      StructField("p50", DoubleType),
      StructField("p75", DoubleType),
      StructField("p90", DoubleType)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** The scale path: same profile shape with `approx_percentile`
    * (GK sketch, rank error ≤ 1/`accuracy`) instead of exact
    * percentiles. The exact form's final merge is one task PER COLUMN
    * over that column's value histogram — for a genuinely continuous
    * column |distinct| ≈ |rows| and that task swallows the column at
    * scale. The sketch buffer is bounded (O(accuracy·log n)) and
    * PARTIAL-AGGREGABLE, so the heavy work happens map-side in the one
    * stacked scan and the final merge combines small sketches — no
    * histogram shuffle at all, no per-column row funnel.
    *
    * Use [[numeric]] when percentiles must be value-exact (its results
    * are engine-reproducible and oracle-gated — and fine whenever
    * |distinct values| per column is bounded, e.g. prices, counts,
    * enums); use this for continuous/high-cardinality columns or when
    * the profile is advisory. Counts/min/max/mean are exact in BOTH
    * (same decimal-accumulated mean); only the percentiles are
    * approximate here. Accuracy bounds vs the exact form are
    * spec-pinned on the driver tables.
    */
  def numericApprox(
      df: DataFrame, cols: Seq[String], sumScale: Int = 2,
      accuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val dec = DecimalType(38, sumScale)
    val stacked = df.selectExpr(
      s"stack(${cols.length}, " +
        cols.map(c => s"'$c', CAST($c AS DOUBLE)").mkString(", ") +
        ") AS (col_name, v)")
    stacked.groupBy(col("col_name"))
      .agg(
        count(col("v")).as("n"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("nulls"),
        min(col("v")).as("min"),
        max(col("v")).as("max"),
        sum(col("v").cast(dec)).cast(DoubleType).as("sm"),
        expr(s"approx_percentile(v, array(0.25, 0.5, 0.75, 0.9), $accuracy)")
          .as("pct"))
      .select(
        col("col_name"),
        col("n"),
        col("nulls"),
        col("min"),
        col("max"),
        when(col("n") > 0, col("sm") / col("n")).as("mean"),
        element_at(col("pct"), 1).as("p25"),
        element_at(col("pct"), 2).as("p50"),
        element_at(col("pct"), 3).as("p75"),
        element_at(col("pct"), 4).as("p90"))
  }

  /** Per-GROUP numeric profile of one value column — the stratified
    * twin of [[numeric]]: one row per distinct `groupCols` combination
    * with (n, nulls, n_distinct, min, max, mean, p25, p50, p75, p90).
    * This is the "does src2's length distribution look like src0's"
    * question every per-domain curation cut starts from.
    *
    * Same two-stage shape as [[numeric]], keyed by (group, value): the
    * first aggregate collapses rows to the per-group value HISTOGRAM
    * with map-side partial combine, so the shuffle carries at most
    * Σ|distinct values per group| rows, and the percentile merge in
    * stage two works over histogram entries, not raw rows. Groups hash
    * across the cluster independently — no single-task funnel. The
    * same caveat as [[numeric]] applies: a genuinely continuous value
    * column degenerates the histogram toward row count — route those
    * to [[numericApprox]]'s sketch.
    */
  def numericByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      sumScale: Int = 2
  ): DataFrame = {
    require(groupCols.nonEmpty, "numericByGroup requires group columns")
    val dec = DecimalType(38, sumScale)
    val hist = df
      .groupBy(groupCols.map(col) :+ col(valueCol).cast(DoubleType).as("v"): _*)
      .agg(count(lit(1)).as("cnt"))
    // pin the final exchange by group (the [[numeric]] fix): the
    // percentile merge is CPU-heavy per group over byte-tiny histogram
    // rows, so AQE's byte-based coalescing would serialize every group
    // into one task; hashing by the group keys keeps the merges parallel
    hist.repartition(groupCols.map(col): _*).groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(col("v").isNotNull, col("cnt")).otherwise(0L)).as("n"),
        sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("nulls"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
        min(col("v")).as("min"),
        max(col("v")).as("max"),
        sum(col("v").cast(dec) * col("cnt")).cast(DoubleType).as("sm"),
        expr("percentile(v, array(0.25, 0.5, 0.75, 0.9), cnt)").as("pct"))
      .select(
        groupCols.map(col) ++ Seq(
          col("n"),
          col("nulls"),
          col("n_distinct"),
          col("min"),
          col("max"),
          when(col("n") > 0, col("sm") / col("n")).as("mean"),
          element_at(col("pct"), 1).as("p25"),
          element_at(col("pct"), 2).as("p50"),
          element_at(col("pct"), 3).as("p75"),
          element_at(col("pct"), 4).as("p90")): _*)
  }

  /** Per-DIMENSION profile of an `Array[Float|Double]` embedding
    * column — the vector-store QC pass (dead dimensions, scale drift,
    * collapsed variance) run before indexing or quantizing a corpus:
    * one row per dimension index — (dim, n non-null, nulls, min, max,
    * mean, std).
    *
    * Shape: `posexplode` fans each vector into (dim, value) pairs,
    * then ONE hash aggregate with map-side partial combine — each task
    * reduces its rows to `dim` groups before the (tiny, ≤ dim rows per
    * task) shuffle; nothing else moves. Means and second moments
    * accumulate in DECIMAL (order-independent, engine-reproducible);
    * std derives as sqrt(E[x²] − mean²) in a fixed double order, with
    * the tiny-negative guard for zero-variance dimensions.
    * `sumScale = 9` covers float inputs: x and x² are exact doubles,
    * ROUNDED to the scale explicitly before the decimal cast — a raw
    * double→DECIMAL cast is HALF_UP in Spark but HALF_EVEN in DuckDB,
    * and float data is full of short dyadics that tie exactly at the
    * scale digit (0.1494140625 flipped this gate at sf0.1); `round()`
    * is half-away-from-zero in both engines, so rounding first makes
    * the cast input a non-tie and the sums engine-exact.
    */
  def vector(df: DataFrame, vecCol: String, sumScale: Int = 9): DataFrame = {
    val dec = DecimalType(38, sumScale)
    val x = col("x").cast(DoubleType)
    df.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(
        // n counts NON-NULL elements only — sum/min/max skip nulls, so
        // a count(*) denominator would silently deflate mean/std on
        // vectors containing null elements (the numeric() convention:
        // n + an explicit nulls column)
        count(when(x.isNotNull, lit(1))).as("n"),
        sum(when(x.isNull, 1L).otherwise(0L)).as("nulls"),
        min(x).as("min"),
        max(x).as("max"),
        sum(round(x, sumScale).cast(dec)).cast(DoubleType).as("_sm"),
        sum(round(x * x, sumScale).cast(dec)).cast(DoubleType).as("_sq"))
      .select(
        col("dim"),
        col("n"),
        col("nulls"),
        col("min"),
        col("max"),
        (col("_sm") / col("n")).as("mean"),
        sqrt(greatest(
          col("_sq") / col("n") - (col("_sm") / col("n")) * (col("_sm") / col("n")),
          lit(0.0))).as("std"))
  }

  /** Winsorize a numeric column at exact percentile bounds — the
    * outlier-clipping step before scale-sensitive downstream work
    * (means, regressions, quantization ranges). Bounds come from the
    * same value-histogram percentile path as [[numeric]] (exact,
    * engine-reproducible — NOT a sketch), collected as two doubles of
    * driver metadata; the clip itself is a narrow codegen'd
    * `CASE WHEN` — no join, no shuffle, nulls pass through unclipped.
    * Replaces `colName` in place.
    */
  /** Exact percentiles of one column via the value-histogram path (the
    * [[numeric]] shape: distinct values + frequencies, then the
    * frequency-weighted exact `percentile`). Null when the column has
    * no non-null values.
    */
  def exactPercentiles(
      df: DataFrame,
      colName: String,
      probs: Seq[Double]
  ): Option[Seq[Double]] =
    exactPercentilesImpl(df, colName, probs, 1024, 1L << 16)

  /** [[exactPercentiles]] with the selection knobs exposed — specs
    * shrink `directThreshold` to force multi-level narrowing on small
    * data. The histogram + distributed-selection design (see the
    * object scaladoc) replaced the single-reduce `percentile(v, p,
    * cnt)` aggregate: same values bit-for-bit ([[interpolateRanks]]),
    * but no stage's memory is ∝ |distinct values| any more.
    */
  private[graft] def exactPercentilesImpl(
      df: DataFrame,
      colName: String,
      probs: Seq[Double],
      buckets: Int,
      directThreshold: Long
  ): Option[Seq[Double]] =
    exactPercentilesFromHistogram(
      df.select(col(colName).cast(DoubleType).as("v"))
        .filter(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as("cnt")),
      probs, buckets, directThreshold)

  /** [[exactPercentiles]] when the data is ALREADY a value histogram
    * `(v, cnt)` — the entry point the STREAMING quantile monitor
    * shares: its versioned state is exactly such a histogram, so each
    * batch pays the distributed selection over histogram rows and
    * never re-sees the value stream. Same interpolation arithmetic
    * bit-for-bit ([[interpolateRanks]]); rows with null v or cnt ≤ 0
    * are ignored; duplicate values sum.
    */
  def exactPercentilesFromHistogram(
      hist: DataFrame,
      probs: Seq[Double],
      buckets: Int = 1024,
      directThreshold: Long = 1L << 16
  ): Option[Seq[Double]] = {
    val h = hist
      .select(lit("c").as("g"), col("v").cast(DoubleType).as("v"),
        col("cnt").cast(LongType).as("cnt"))
      .filter(col("v").isNotNull && col("cnt") > 0L)
      .groupBy(col("g"), col("v")).agg(sum(col("cnt")).as("cnt"))
      .localCheckpoint()
    val m = h
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("d"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect()(0)
    if (m.isNullAt(0) || m.getLong(0) == 0L) None
    else {
      val n = m.getLong(0)
      val stats = Map("c" -> GroupStats(n, m.getLong(1), m.getDouble(2), m.getDouble(3)))
      val sel = groupedOrderStats(h, stats,
        Map("c" -> ranksFor(n, probs)), buckets, directThreshold)
      Some(interpolateRanks(n, probs, rk => sel(("c", rk))))
    }
  }

  /** Exact WEIGHTED percentiles — the value at 0-based weighted rank
    * `⌊q·(W−1)⌋`, W = Σweight: the MASS-weighted view of a
    * distribution ("the median TOKEN lives in a doc of length X"),
    * which under size skew sits far from the doc-weighted percentile
    * ([[exactPercentiles]] is the weight≡1 special case of the rank
    * rule, minus interpolation). No interpolation: the result is an
    * exact data value, so integer-valued columns stay oracle/hash-safe.
    * Weights cast to long; null/zero/negative-weight rows are ignored
    * (a row with no mass has no position on the mass axis). None when
    * nothing carries weight.
    *
    * Scale shape: identical to [[exactPercentiles]] — the
    * distinct-value histogram carries WEIGHT SUMS as multiplicities
    * (map-side combined; one pass over the column), and the
    * distributed range-narrowing selection touches histogram slices
    * only.
    */
  def weightedPercentiles(
      df: DataFrame,
      colName: String,
      weight: Column,
      probs: Seq[Double]
  ): Option[Seq[Double]] = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"weightedPercentiles: probs must be in [0,1], got $probs")
    val hist = df
      .select(lit("c").as("g"), col(colName).cast(DoubleType).as("v"),
        weight.cast(LongType).as("_w"))
      .filter(col("v").isNotNull && col("_w").isNotNull && col("_w") > 0)
      .groupBy(col("g"), col("v")).agg(sum(col("_w")).as("cnt"))
      .localCheckpoint()
    val m = hist
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("d"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect()(0)
    if (m.isNullAt(0) || m.getLong(0) == 0L) None
    else {
      val w = m.getLong(0)
      val stats = Map("c" -> GroupStats(w, m.getLong(1), m.getDouble(2), m.getDouble(3)))
      // floor(q·(W−1)) in IEEE doubles — one multiply + floor, the same
      // bits in any engine (the oracle recomputes the identical rank)
      val rks = probs.map(q => math.floor(q * (w - 1).toDouble).toLong)
      val sel = groupedOrderStats(hist, stats, Map("c" -> rks))
      Some(rks.map(r => sel(("c", r))))
    }
  }

  /** [[weightedPercentiles]] stratified by a group column (round-9
    * verdict #7): per group, the value at mass-weighted rank
    * `floor(q·(W_g − 1))` for each requested probability — the
    * per-source length/quality calibration a mixture pipeline needs
    * (one global percentile mis-prices every source whose distribution
    * differs from the blend). Output: `(<group>, p_ppm BIGINT,
    * value DOUBLE)`, one row per (group, prob).
    *
    * Scale shape: ONE corpus pass builds the per-(group, value) weight
    * histogram; per-group totals are a metadata-sized collect
    * (#groups rows); rank selection runs through the batched
    * [[groupedOrderStats]] distributed selection — level 1 is one
    * bucket-totals aggregate over ALL groups together, so the group
    * count multiplies only driver metadata, never passes over the
    * data. Rows with null/non-positive weight or null value are
    * excluded (the [[weightedPercentiles]] contract); a group with no
    * surviving rows emits nothing.
    */
  def weightedPercentilesByGroup(
      df: DataFrame,
      groupCol: String,
      colName: String,
      weight: Column,
      probs: Seq[Double]
  ): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"weightedPercentilesByGroup: probs must be in [0,1], got $probs")
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df
      .select(col(groupCol).cast(StringType).as("g"),
        col(colName).cast(DoubleType).as("v"),
        weight.cast(LongType).as("_w"))
      .filter(col("g").isNotNull && col("v").isNotNull &&
        col("_w").isNotNull && col("_w") > 0)
      .groupBy(col("g"), col("v")).agg(sum(col("_w")).as("cnt"))
      .localCheckpoint()
    val statRows = hist.groupBy(col("g"))
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("d"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect()
    val stats = statRows.map { r =>
      r.getString(0) -> GroupStats(r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))
    }.toMap
    // floor(q·(W_g−1)) in IEEE doubles — the weightedPercentiles rank
    // rule, per group
    val ranks = stats.map { case (g, s) =>
      g -> probs.map(q => math.floor(q * (s.n - 1).toDouble).toLong)
    }
    val sel = groupedOrderStats(hist, stats, ranks)
    val rows = for {
      g <- stats.keys.toSeq.sorted
      (q, i) <- probs.zipWithIndex
    } yield (g, math.round(q * 1000000.0), sel((g, ranks(g)(i))))
    rows.toDF(groupCol, "p_ppm", "value")
  }

  /** Data-expectation validation report — the ingest-gate check a
    * pipeline runs before accepting a batch (the "expectations" family:
    * range checks, null rates, referential sanity): each rule is a
    * named PASS predicate; a row violates the rule when the predicate
    * is false OR null (an unassessable row fails — silently passing
    * null rows is how bad batches slip through). Output: one row per
    * rule, `(rule STRING, n_rows BIGINT, n_violations BIGINT,
    * violation_ppm BIGINT)` with `violation_ppm = v·10⁶ div
    * max(n, 1)`.
    *
    * Scale shape: ONE aggregate pass whatever the rule count — every
    * rule folds into the same map-side-combined agg as a conditional
    * sum; the per-rule explode happens driver-side on the single
    * result row. Rules are plain `Column` predicates, so filter
    * pushdown and codegen apply to the scan beneath.
    */
  def expectationReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectationReport: no rules")
    require(rules.map(_._1).distinct.size == rules.size,
      s"expectationReport: duplicate rule names in ${rules.map(_._1)}")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = count(lit(1)).as("_n") +:
      rules.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"_v$i")
      }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val n = row.getLong(0)
    rules.zipWithIndex.map { case ((name, _), i) =>
      val v = row.getLong(i + 1)
      (name, n, v, v * 1000000L / math.max(n, 1L))
    }.toDF("rule", "n_rows", "n_violations", "violation_ppm")
  }

  /** [[expectationReport]] stratified by a group column — the
    * per-source data-health matrix ("which FEED is shipping the bad
    * rows"): same pass/violation semantics (false OR null = violation),
    * one row per (group, rule). Output: `(<group>, rule, n_rows,
    * n_violations, violation_ppm)`.
    *
    * Scale shape: still ONE aggregate pass — every rule is a
    * conditional sum inside the same map-side-combined groupBy; the
    * per-rule explode runs driver-side over the ≤#groups result rows
    * (group-cardinality metadata, the per-group-budgets convention).
    */
  def expectationReportByGroup(
      df: DataFrame,
      groupCol: String,
      rules: Seq[(String, Column)]
  ): DataFrame = {
    require(rules.nonEmpty, "expectationReportByGroup: no rules")
    require(rules.map(_._1).distinct.size == rules.size,
      s"expectationReportByGroup: duplicate rule names in ${rules.map(_._1)}")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = count(lit(1)).as("_n") +:
      rules.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"_v$i")
      }
    val agg = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast(StringType).as("_g"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    agg.toSeq.flatMap { r =>
      val g = r.getString(0)
      val n = r.getLong(1)
      rules.zipWithIndex.map { case ((name, _), i) =>
        val v = r.getLong(i + 2)
        (g, name, n, v, v * 1000000L / math.max(n, 1L))
      }
    }.toDF(groupCol, "rule", "n_rows", "n_violations", "violation_ppm")
  }

  /** Lorenz curve of mass concentration across groups — [[massGini]]'s
    * pointwise companion (the Gini is twice the area between this curve
    * and the diagonal): groups sorted ascending by (mass, group), each
    * emitting its cumulative share of groups and of mass. "The bottom
    * 80% of domains hold 12% of the tokens" reads directly off the
    * output. Exact integers: `(group, grp_rank BIGINT, cum_groups_ppm
    * BIGINT, cum_mass_ppm BIGINT)` with both shares `cum·10⁶ div
    * total`. Exclusions and scale shape match [[massGini]] (one
    * map-side-combined aggregate; the window runs over ≤ #groups rows).
    */
  def lorenzCurve(df: DataFrame, groupCol: String, weight: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val masses = df
      .select(col(groupCol).cast(StringType).as("_g"),
        weight.cast(LongType).as("_w"))
      .filter(col("_g").isNotNull && col("_w").isNotNull && col("_w") >= 0)
      .groupBy(col("_g")).agg(sum(col("_w")).as("_m"))
    val w = Window.orderBy(col("_m"), col("_g"))
    val wAll = Window.partitionBy(lit(1))
    masses
      .withColumn("_i", row_number().over(w).cast(LongType))
      .withColumn("_cum", sum(col("_m")).over(
        Window.orderBy(col("_m"), col("_g"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_s", sum(col("_m")).over(wAll))
      .filter(col("_s") > 0)
      .select(col("_g").as(groupCol), col("_i").as("grp_rank"),
        expr("CAST(_i * 1000000 div _n AS BIGINT)").as("cum_groups_ppm"),
        expr("CAST(_cum * 1000000 div _s AS BIGINT)").as("cum_mass_ppm"))
  }

  /** Benford first-significant-digit audit per group — the classic
    * fabricated/duplicated-feed tripwire: organically-sized quantities
    * (file sizes, document lengths, view counts) follow Benford's law,
    * P(d) = log₁₀(1 + 1/d); synthetic padding, truncation bugs, and
    * copy-amplified feeds show up as a digit histogram far from it.
    *
    * Exact integer surface: the first digit of a positive BIGINT is its
    * leading decimal character (string head — identical arithmetic in
    * every engine), observed frequency is `cnt·10⁶ div n`, and the
    * reported deviation is `|freq_ppm − expected_ppm|` against the
    * [[benfordExpectedPpm]] ladder (log₁₀ literals computed ONCE
    * driver-side — the NDCG/BM25 literal discipline — so no runtime
    * transcendentals). Non-positive and null values are excluded (they
    * have no Benford digit); digits a group never produces emit no row
    * (the audit reads absence directly).
    *
    * Scale shape: ONE map-side-combined aggregate to ≤ 9·|groups| cells;
    * the totals join is group-metadata-sized. `cnt·10⁶` is guarded
    * against int64 overflow (the [[Graph.pageRankScaled]] discipline
    * applied per-row: cnt ≤ 9.2·10¹² is checked structurally by using
    * the same ppm product bound).
    *
    * Output: `(group STRING, digit BIGINT, cnt BIGINT, freq_ppm BIGINT,
    * dev_ppm BIGINT)`.
    */
  def benfordDeviation(df: DataFrame, groupCol: String, value: Column): DataFrame = {
    val digits = df
      .select(col(groupCol).cast(StringType).as("group"),
        value.cast(LongType).as("_v"))
      .filter(col("group").isNotNull && col("_v").isNotNull && col("_v") > 0)
      .select(col("group"),
        substring(col("_v").cast(StringType), 1, 1).cast(LongType).as("digit"))
    val counts = digits.groupBy("group", "digit").agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("group").agg(sum(col("cnt")).as("_n"))
    val expCase = "CASE digit " + benfordExpectedPpm.zipWithIndex
      .map { case (e, i) => s"WHEN ${i + 1} THEN ${e}L" }
      .mkString(" ") + " END"
    counts.join(totals, Seq("group"))
      .select(col("group"), col("digit"), col("cnt"),
        expr("CAST(cnt * 1000000L div _n AS BIGINT)").as("freq_ppm"),
        expr(s"CAST(abs(cnt * 1000000L div _n - $expCase) AS BIGINT)").as("dev_ppm"))
  }

  /** Benford expectations floor(log₁₀(1 + 1/d)·10⁶) for d = 1..9 —
    * driver-side literals shared by the operator and its oracle SQL
    * (consistent by construction, never recomputed distributed).
    */
  val benfordExpectedPpm: Seq[Long] =
    (1 to 9).map(d => math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)

  /** HyperLogLog registers (Flajolet et al. 2007) over FNV-1a item
    * hashes, per group — the mergeable distinct-count sketch, built
    * DETERMINISTICALLY so an external engine replays every register
    * bit-for-bit (unlike `approx_count_distinct`, whose sketch is an
    * opaque binary): bucket = low 10 hash bits, rank ρ = leading-zero
    * count of the remaining 54 bits + 1, register = max ρ. Registers
    * max-merge across partitions, batches, and corpora — the property
    * that makes ONE pass per source enough at any scale, where exact
    * distinct needs a full shuffle of the distinct universe.
    *
    * Output: `(group STRING, bucket BIGINT, m_rho BIGINT)` — ≤ m rows
    * per group (m = 1024), metadata-sized forever.
    */
  def hllRegisters(df: DataFrame, groupCol: String, item: Column): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val h = ColumnBridge.column(graft.plans.FnvHash64(
      ColumnBridge.expression(concat(item.cast(StringType), lit(":hll")))))
    df.select(col(groupCol).cast(StringType).as("group"), h.as("_h"))
      .filter(col("group").isNotNull)
      .select(col("group"), pmod(col("_h"), lit(1024L)).as("bucket"),
        shiftrightunsigned(col("_h"), 10).as("_rem"))
      .withColumn("_rho", expr(hllRhoCaseSql("_rem", 54)))
      .groupBy("group", "bucket").agg(max(col("_rho")).cast(LongType).as("m_rho"))
  }

  /** The raw HLL estimate per group from [[hllRegisters]] — exact
    * integer arithmetic end to end: the indicator Σ 2^(−M_j) scales by
    * 2⁶³ into a pure integer S (observed registers contribute
    * 2^(63−M), the 1024−nb empty ones 2⁶³ each), and
    *
    *   est = (α_ppm · m² · 2⁶³) div (S · 10⁶)
    *
    * folds driver-side in BigInt over the ≤|groups| aggregated rows
    * (the [[cohenKappaE6]] discipline — group-count metadata only).
    * This is the RAW estimator: the small-range linear-counting
    * correction needs ln(), which this engine keeps out of compared
    * surfaces by policy; raw HLL under-reads below ~2.5m distincts,
    * which the gate exposes by emitting the exact count alongside.
    *
    * Output: `(group STRING, est_distinct BIGINT)`.
    */
  def hllEstimateRaw(df: DataFrame, groupCol: String, item: Column): DataFrame =
    hllEstimateFromRegisters(hllRegisters(df, groupCol, item))

  /** The [[hllEstimateRaw]] fold from an already-built register table
    * `(group, bucket, m_rho)` — shared with the streaming form, whose
    * committed state IS such a table.
    */
  def hllEstimateFromRegisters(registers: DataFrame): DataFrame = {
    val spark = registers.sparkSession
    import spark.implicits._
    val d38 = DecimalType(38, 0)
    val agg = registers
      .groupBy("group")
      .agg(sum(expr("shiftleft(1L, CAST(63 - m_rho AS INT))").cast(d38)).as("_so"),
        count(lit(1)).as("_nb"))
      .collect()
    val two63 = BigInt(1) << 63
    val num = BigInt(hllAlphaPpm1024) * BigInt(1024L * 1024L) * two63
    val rows = agg.map { r =>
      val so = BigInt(r.getDecimal(1).toBigInteger)
      val s = so + BigInt(1024L - r.getLong(2)) * two63
      (r.getString(0), (num / (s * 1000000)).toLong)
    }.toSeq
    rows.toDF("group", "est_distinct")
  }

  /** Count-min sketch cells (Cormode & Muthukrishnan 2005) over FNV
    * row-hashes — the counting companion to [[hllRegisters]]: fixed
    * `depth × width` cells estimate ANY item's frequency with one-sided
    * error (estimate ≥ true count, overshoot bounded by collisions),
    * in `depth·width` integers regardless of the item universe. Cells
    * SUM-merge across partitions, batches, and corpora. Deterministic
    * by construction (row i hashes `item ++ ":cms" ++ i` through the
    * shared FNV-1a), so an external engine replays every cell.
    *
    * Scale shape: per-item counts first (ONE map-side-combined
    * aggregate — the depth-fold explodes `depth` rows per DISTINCT
    * item, not per occurrence), then a ≤ depth·width-cell aggregate.
    *
    * Output: `(row BIGINT, col BIGINT, cnt BIGINT)` — sparse (absent
    * cell = 0).
    */
  def cmsSketch(df: DataFrame, item: Column, depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 8, s"cmsSketch: depth in [1,8], got $depth")
    require(width >= 16, s"cmsSketch: width >= 16, got $width")
    import org.apache.spark.sql.graft.ColumnBridge
    val counts = df.select(item.cast(StringType).as("_it"))
      .filter(col("_it").isNotNull)
      .groupBy("_it").agg(count(lit(1)).as("_c"))
    def h(i: Int): Column = pmod(ColumnBridge.column(graft.plans.FnvHash64(
      ColumnBridge.expression(concat(col("_it"), lit(s":cms$i"))))),
      lit(width.toLong))
    counts
      .select(col("_c"), explode(array((0 until depth).map(i =>
        struct(lit(i.toLong).as("r"), h(i).as("c"))): _*)).as("_rc"))
      .groupBy(col("_rc.r").as("row"), col("_rc.c").as("col"))
      .agg(sum(col("_c")).as("cnt"))
  }

  /** Point estimates off a [[cmsSketch]] cell table for a set of query
    * items: est(q) = min over rows of the addressed cell (absent = 0).
    * `queries` must carry an `item STRING` column; the sketch is the
    * big side only by courtesy — both are metadata-sized.
    * Output: `(item STRING, cms_est BIGINT)`.
    */
  def cmsEstimates(
      sketch: DataFrame,
      queries: DataFrame,
      depth: Int = 4,
      width: Int = 1024
  ): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    def h(i: Int): Column = pmod(ColumnBridge.column(graft.plans.FnvHash64(
      ColumnBridge.expression(concat(col("item"), lit(s":cms$i"))))),
      lit(width.toLong))
    val addressed = queries.select(col("item"),
        explode(array((0 until depth).map(i =>
          struct(lit(i.toLong).as("r"), h(i).as("c"))): _*)).as("_rc"))
      .select(col("item"), col("_rc.r").as("row"), col("_rc.c").as("col"))
    addressed.join(sketch, Seq("row", "col"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Cross-group distinct-OVERLAP matrix by sketch algebra — the
    * 100 TB answer to "how much content do these sources share"
    * WITHOUT any pair join over items: per-group [[hllRegisters]]
    * max-merge into union sketches, and inclusion–exclusion gives
    * `|A∩B| ≈ est(A) + est(B) − est(A∪B)` per pair. One corpus pass
    * builds every group's registers; the pair algebra folds driver-side
    * over ≤ 1024·|groups| register rows (group-count metadata — the
    * [[cohenKappaE6]] discipline). Estimates share the exact
    * [[hllEstimateRaw]] integer arithmetic, so the whole matrix is
    * engine-replayable; `est_inter` can go slightly negative for
    * near-disjoint pairs (estimator noise) and is deliberately emitted
    * RAW — clamping would hide the error bar.
    *
    * Output: `(src_a, src_b, est_a, est_b, est_union, est_inter)`,
    * one row per unordered group pair (src_a < src_b).
    */
  def hllOverlapMatrix(df: DataFrame, groupCol: String, item: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val regs = hllRegisters(df, groupCol, item).collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
      }
    val two63 = BigInt(1) << 63
    val num = BigInt(hllAlphaPpm1024) * BigInt(1024L * 1024L) * two63
    def est(m: Map[Long, Long]): Long = {
      val so = m.values.map(v => BigInt(1) << (63 - v.toInt)).sum
      val s = so + BigInt(1024 - m.size) * two63
      (num / (s * 1000000)).toLong
    }
    val singles = regs.map { case (g, m) => g -> est(m) }
    val groups = regs.keys.toSeq.sorted
    val rows = for {
      i <- groups.indices
      j <- (i + 1) until groups.size
      a = groups(i); b = groups(j)
    } yield {
      val merged = (regs(a).keySet ++ regs(b).keySet).iterator
        .map(k => k -> math.max(regs(a).getOrElse(k, 0L), regs(b).getOrElse(k, 0L)))
        .toMap
      val eu = est(merged)
      (a, b, singles(a), singles(b), eu, singles(a) + singles(b) - eu)
    }
    rows.toDF("src_a", "src_b", "est_a", "est_b", "est_union", "est_inter")
  }

  /** α_m·10⁶ for m = 1024 (the published 0.7213/(1 + 1.079/m)),
    * floored — a driver literal shared with oracles.
    */
  val hllAlphaPpm1024: Long =
    math.floor(0.7213 / (1.0 + 1.079 / 1024.0) * 1e6).toLong

  /** The ρ (leading-zeros + 1) CASE ladder for a `width`-bit value as
    * SQL text — generated once and used VERBATIM by both the Spark
    * expression and the DuckDB oracle, so the two engines cannot
    * disagree on rank extraction.
    */
  def hllRhoCaseSql(c: String, width: Int): String = {
    val whens = (width - 1 to 0 by -1)
      .map(b => s"WHEN $c >= ${1L << b} THEN ${width - b}")
    s"CASE ${whens.mkString(" ")} ELSE ${width + 1} END"
  }

  /** Cohen's kappa between two categorical label columns — chance-
    * corrected agreement, the standard answer to "do these two quality
    * filters/classifiers actually agree, or do they just both say KEEP
    * 90% of the time?" (raw agreement is inflated exactly when labels
    * are skewed, which corpus quality labels always are). Exact
    * integer form over the K×K confusion cell counts:
    *
    *   kappa_e6 = (n·agree − Σ_k na_k·nb_k) · 10⁶ div (n² − Σ_k na_k·nb_k)
    *
    * computed driver-side in BigInt (n² overflows int64 past ~3·10⁹
    * rows) and truncated toward zero — the direction Spark's `div` and
    * DuckDB's `//` share, pinned for NEGATIVE kappa (worse-than-chance)
    * by the [[Similarity.kmeansCentroidsFromSums]] precedent. Output:
    * one row `(n BIGINT, n_agree BIGINT, kappa_e6 BIGINT)`; a
    * degenerate pe = 1 (both raters constant with identical marginals)
    * emits nothing — kappa is undefined there, not 0.
    *
    * Scale shape: ONE map-side-combined aggregate to ≤K² confusion
    * cells; everything after is driver metadata. Null labels on either
    * side are excluded (no agreement is defined for a missing rating).
    */
  def cohenKappaE6(df: DataFrame, colA: Column, colB: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df
      .select(colA.cast(StringType).as("_a"), colB.cast(StringType).as("_b"))
      .filter(col("_a").isNotNull && col("_b").isNotNull)
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = BigInt(cells.map(_._3).sum)
    val agree = BigInt(cells.filter(c => c._1 == c._2).map(_._3).sum)
    val na = cells.groupBy(_._1).map { case (k, v) => k -> BigInt(v.map(_._3).sum) }
    val nb = cells.groupBy(_._2).map { case (k, v) => k -> BigInt(v.map(_._3).sum) }
    val chance = na.map { case (k, c) => c * nb.getOrElse(k, BigInt(0)) }.sum
    val denom = n * n - chance
    if (n == 0 || denom == 0) {
      Seq.empty[(Long, Long, Long)].toDF("n", "n_agree", "kappa_e6")
    } else {
      val kappa = (n * agree - chance) * 1000000 / denom // BigInt /: trunc toward zero
      Seq((n.toLong, agree.toLong, kappa.toLong))
        .toDF("n", "n_agree", "kappa_e6")
    }
  }

  /** Trimmed mean per group — the robust location estimate a mixture
    * pipeline calibrates sources with (an outlier page can't drag its
    * source's mean length/quality): per group, drop values strictly
    * below the `loQ` percentile or above the `hiQ` percentile (both by
    * the exact [[weightedPercentilesByGroup]] rank rule with weight ≡
    * 1, i.e. the value at rank `floor(q·(n−1))`), then the mean of the
    * survivors as an exact scaled integer `mean_e6 = (Σv·10⁶) div
    * n_kept`. Values are cast to BIGINT — the operator is for
    * NON-NEGATIVE integer measures (lengths, token counts): below zero
    * Spark's truncating `div` and a flooring engine disagree, so the
    * sign restriction is part of the replayability contract. Output:
    * `(<group>, n_kept BIGINT, mean_e6 BIGINT)`.
    *
    * Scale shape: thresholds ride the batched distributed selection
    * (one histogram pass + level-1 bucket totals over ALL groups
    * together); the per-group (lo, hi) table is driver metadata
    * broadcast into ONE filtered aggregate — two corpus passes total,
    * no per-group scan, sums in DECIMAL(38,0).
    */
  def trimmedMeanByGroup(
      df: DataFrame,
      groupCol: String,
      colName: String,
      loQ: Double,
      hiQ: Double
  ): DataFrame = {
    require(loQ >= 0.0 && hiQ <= 1.0 && loQ < hiQ,
      s"trimmedMeanByGroup: need 0 <= loQ < hiQ <= 1, got ($loQ, $hiQ)")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(groupCol).cast(StringType).as("_g"),
        col(colName).cast(LongType).as("_v"))
      .filter(col("_g").isNotNull && col("_v").isNotNull)
    val thr = weightedPercentilesByGroup(
        vals.select(col("_g"), col("_v")), "_g", "_v", lit(1L), Seq(loQ, hiQ))
      .collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        val byP = rows.map(r => r.getLong(1) -> r.getDouble(2)).toMap
        (g, byP(math.round(loQ * 1000000.0)).toLong,
          byP(math.round(hiQ * 1000000.0)).toLong)
      }.toSeq
    if (thr.isEmpty) {
      return Seq.empty[(String, Long, Long)]
        .toDF(groupCol, "n_kept", "mean_e6")
    }
    val thrDf = broadcast(thr.toDF("_g", "_lo", "_hi"))
    vals.join(thrDf, Seq("_g"))
      .filter(col("_v") >= col("_lo") && col("_v") <= col("_hi"))
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("n_kept"), sum(col("_v")).as("_s"))
      .select(col("_g").as(groupCol), col("n_kept"),
        expr("CAST((CAST(_s AS DECIMAL(38,0)) * 1000000) div n_kept AS BIGINT)")
          .as("mean_e6"))
  }

  /** Gini coefficient of mass concentration across groups — the
    * corpus-composition diagnostic ("how concentrated is the token
    * budget across domains/sources"): 0 = every group carries equal
    * mass, →1 = one group carries everything. Exact integer form of
    * the standard sorted-rank formula over per-group masses m₁ ≤ … ≤
    * m_n (ties ordered by group for determinism):
    *
    *   gini_ppm = (2·Σ i·mᵢ − (n+1)·S) · 10⁶ div (n·S)
    *
    * Output: one row `(n_groups BIGINT, total_mass BIGINT, gini_ppm
    * BIGINT)`; the numerator is ≥ 0 by the ascending sort, so floor
    * and truncating division agree across engines. Null groups, null
    * or negative weights are excluded; an empty or zero-mass input
    * emits nothing (a Gini of nothing is undefined, not 0).
    *
    * Scale shape: ONE map-side-combined aggregate to per-group masses;
    * the rank window and final fold run over #groups rows — driver
    * metadata next to the corpus (the histogram convention), never a
    * corpus-row window. Products ride DECIMAL(38,0).
    */
  def massGini(df: DataFrame, groupCol: String, weight: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    val masses = df
      .select(col(groupCol).cast(StringType).as("_g"),
        weight.cast(LongType).as("_w"))
      .filter(col("_g").isNotNull && col("_w").isNotNull && col("_w") >= 0)
      .groupBy(col("_g")).agg(sum(col("_w")).as("_m"))
    // single-partition window over ≤ #groups rows — bounded by
    // construction, never the corpus
    val w = Window.orderBy(col("_m"), col("_g"))
    masses
      .withColumn("_i", row_number().over(w).cast(LongType))
      .agg(count(lit(1)).as("_n"), sum(col("_m")).as("_s"),
        sum(col("_i").cast(d38) * col("_m").cast(d38)).as("_wsum"))
      .filter(col("_s") > 0)
      .select(col("_n").as("n_groups"), col("_s").as("total_mass"),
        expr("CAST(((2 * _wsum - (_n + 1) * CAST(_s AS DECIMAL(38,0))) * 1000000) " +
          "div (CAST(_n AS DECIMAL(38,0)) * _s) AS BIGINT)").as("gini_ppm"))
  }

  /** Score-MASS cut ("nucleus" curation): keep the highest-score rows
    * that together carry ≈`keepMassPpm` of the TOTAL score mass — the
    * top-p idea applied to corpus curation (keep the docs holding 80 %
    * of the quality/length mass, not the top 80 % of docs). The
    * threshold is the mass-weighted `(1 − p)` percentile of the score
    * with the score itself as the weight ([[weightedPercentiles]]);
    * `keep ⇔ score ≥ t`. Kept mass can overshoot the target by the
    * threshold value's ties (documented — exact tie accounting would
    * reintroduce an ordered cumulative pass over the tie set; compose
    * with a keyed quota if the budget is hard). Scores must be
    * positive longs (a row's score IS its mass).
    *
    * Scale shape: the histogram + distributed selection of
    * [[weightedPercentiles]] picks `t` (driver-metadata work), then one
    * narrow codegen'd filter — the cut itself never shuffles.
    */
  def scoreMassCut(
      df: DataFrame,
      scoreCol: String,
      keepMassPpm: Long
  ): DataFrame = {
    require(keepMassPpm >= 1 && keepMassPpm <= 1000000,
      s"scoreMassCut: keepMassPpm must be in [1, 1e6], got $keepMassPpm")
    val q = (1000000L - keepMassPpm).toDouble / 1000000.0
    val t = weightedPercentiles(df, scoreCol, col(scoreCol), Seq(q))
      .map(_.head)
      .getOrElse(return df.withColumn("keep", lit(false)))
    df.withColumn("keep", col(scoreCol).cast(DoubleType) >= t)
  }

  /** SKETCH-based percentile bounds — the scale path of
    * [[exactPercentiles]] for genuinely continuous columns: the exact
    * path reduces a distinct-value histogram whose FINAL-MERGE memory
    * is ∝ |distinct values| (fine for bounded-cardinality columns,
    * hostile at 100× on a continuous one), while `approx_percentile`'s
    * mergeable sketch holds ≤ `accuracy` samples at every stage
    * regardless of cardinality. Bounds are approximate (rank error ≤
    * 1/accuracy, and the sketch returns an observed value rather than
    * interpolating between two) — for clipping/scaling BOUNDS that is
    * the right trade; everything downstream of the bounds stays narrow
    * and exact relative to them. Null when the column has no non-null
    * values.
    */
  def approxPercentiles(
      df: DataFrame,
      colName: String,
      probs: Seq[Double],
      accuracy: Int = 10000
  ): Option[Seq[Double]] = {
    val row = approxPercentileAgg(df, colName, probs, accuracy).collect()(0)
    if (row.isNullAt(0)) None else Some(row.getSeq[Double](0))
  }

  /** The one-row sketch aggregate behind [[approxPercentiles]] —
    * factored out so the plan shape (grand aggregate over raw rows, NO
    * distinct-value groupBy) is directly assertable in specs.
    */
  private[graft] def approxPercentileAgg(
      df: DataFrame,
      colName: String,
      probs: Seq[Double],
      accuracy: Int
  ): DataFrame = {
    require(accuracy > 0, s"approxPercentiles: accuracy must be positive")
    df.select(col(colName).cast(DoubleType).as("v"))
      .agg(expr(
        s"approx_percentile(v, array(${probs.mkString(", ")}), $accuracy)")
        .as("b"))
  }

  private def percentileBounds(
      df: DataFrame,
      colName: String,
      probs: Seq[Double],
      approxBounds: Boolean,
      accuracy: Int
  ): Option[Seq[Double]] =
    if (approxBounds) approxPercentiles(df, colName, probs, accuracy)
    else exactPercentiles(df, colName, probs)

  def winsorize(
      df: DataFrame,
      colName: String,
      loP: Double = 0.05,
      hiP: Double = 0.95,
      approxBounds: Boolean = false, // sketch bounds: the continuous-column scale path
      accuracy: Int = 10000
  ): DataFrame = {
    require(loP >= 0 && hiP <= 1 && loP <= hiP,
      s"winsorize: need 0 <= loP <= hiP <= 1, got ($loP, $hiP)")
    // interpolated bounds are doubles: casting them back into an
    // integer/decimal column would ROUND the bound (HALF_UP can land
    // the "floor" above unclipped values) — refuse rather than clip at
    // a value that is not the stated percentile
    require(df.schema(colName).dataType == DoubleType ||
      df.schema(colName).dataType == FloatType,
      s"winsorize: $colName must be float/double — interpolated bounds " +
        "don't round-trip through integer or decimal types")
    percentileBounds(df, colName, Seq(loP, hiP), approxBounds, accuracy) match {
      // no non-null values -> nothing to bound, nothing to clip
      case None => df
      case Some(Seq(lo, hi)) =>
        df.withColumn(colName,
          when(col(colName).isNull, col(colName))
            .when(col(colName) < lo, lit(lo).cast(df.schema(colName).dataType))
            .when(col(colName) > hi, lit(hi).cast(df.schema(colName).dataType))
            .otherwise(col(colName)))
      case Some(other) => throw new IllegalStateException(
        s"winsorize: expected 2 bounds, got $other")
    }
  }

  /** Keep only rows whose `colName` lies inside the [loP, hiP]
    * interpolated-percentile band — the FILTER twin of [[winsorize]]
    * (outlier-length / outlier-score removal, the curation step that
    * drops degenerate-length documents instead of clipping a feature).
    * Same bounds machinery (distributed-selection exact percentiles, or
    * the sketch switch at scale), same float/double restriction (an
    * interpolated bound doesn't round-trip through integer types), and
    * nulls DROP: a row with no value has no place in a value band.
    */
  def bandFilter(
      df: DataFrame,
      colName: String,
      loP: Double = 0.05,
      hiP: Double = 0.95,
      approxBounds: Boolean = false,
      accuracy: Int = 10000
  ): DataFrame = {
    require(loP >= 0 && hiP <= 1 && loP <= hiP,
      s"bandFilter: need 0 <= loP <= hiP <= 1, got ($loP, $hiP)")
    require(df.schema(colName).dataType == DoubleType ||
      df.schema(colName).dataType == FloatType,
      s"bandFilter: $colName must be float/double — interpolated bounds " +
        "don't round-trip through integer or decimal types")
    percentileBounds(df, colName, Seq(loP, hiP), approxBounds, accuracy) match {
      case None => df.limit(0) // no non-null values -> empty band
      case Some(Seq(lo, hi)) =>
        df.filter(col(colName) >= lo && col(colName) <= hi)
      case Some(other) => throw new IllegalStateException(
        s"bandFilter: expected 2 bounds, got $other")
    }
  }

  /** Per-dimension z-score standardization of an embedding column
    * against a [[vector]] profile — the preprocessing pass before
    * quantization or distance work when dimensions carry different
    * scales. The profile is dim-rows-sized metadata: it collects to two
    * literal arrays (the [[Similarity.assignToCentroids]] convention —
    * building a broadcast, not a data-path collect), so the transform
    * is one NARROW codegen'd `transform` per row — zero joins, zero
    * shuffles. Dead dimensions (std = 0) map to 0.0 rather than
    * NaN/Inf: a constant carries no signal either way. Output replaces
    * `vecCol` with `Array[Double]` z-scores; every arithmetic step is
    * fixed-order double, so an external engine reproduces the exact
    * values from the same profile definition.
    */
  def standardizeVectors(
      df: DataFrame,
      vecCol: String,
      profile: DataFrame
  ): DataFrame = {
    val rows = profile.select(col("dim"), col("mean"), col("std"))
      .collect().sortBy(_.getInt(0))
    require(rows.nonEmpty, "standardizeVectors: empty profile")
    require(rows.map(_.getInt(0)).toSeq == rows.indices.toSeq,
      "standardizeVectors: profile dims must be contiguous from 0")
    val means = array(rows.map(r => lit(r.getDouble(1))): _*)
    val stds = array(rows.map(r => lit(r.getDouble(2))): _*)
    val standardized = zip_with(col(vecCol).cast(ArrayType(DoubleType)),
      sequence(lit(0), lit(rows.length - 1)),
      (x, i) => {
        val m = element_at(means, i + 1)
        val s = element_at(stds, i + 1)
        when(s === 0.0, lit(0.0)).otherwise((x - m) / s)
      })
    // a vector whose length differs from the profile is malformed input:
    // zip_with would silently null-pad or fabricate trailing zeros, so
    // fail the row loudly instead of emitting plausible-looking output.
    // A NULL vector passes through as null (size(null) is null, which
    // must not fall into the error branch — an absent embedding is a
    // fact, not a malformation)
    df.withColumn(vecCol,
      when(col(vecCol).isNull, lit(null).cast(ArrayType(DoubleType)))
        .when(size(col(vecCol)) === rows.length, standardized)
        .otherwise(raise_error(concat(
          lit("standardizeVectors: vector length "),
          size(col(vecCol)).cast(StringType),
          lit(s" != profile dimensionality ${rows.length}")))))
  }

  /** Assign every row to one of `q` equal-probability buckets `[0, q)`
    * by the column's own EXACT quantile bounds — the discretization
    * step for stratified curation and per-decile quality reporting.
    * Bounds at probabilities i/q (i = 1..q-1) come from the same
    * histogram-based [[exactPercentiles]] as [[winsorize]] (driver
    * metadata, one aggregate pass); the assignment is a NARROW
    * codegen'd comparison fold `bucket = Σ_i [x >= b_i]` — monotone,
    * zero joins, zero shuffles. Values at an interpolated bound land in
    * the upper bucket (>=); nulls map to a null bucket. A constant
    * column collapses to ONE occupied bucket (every bound equals the
    * value, so every row counts all q−1 bounds) — the honest answer for
    * a column with no spread.
    */
  def quantileBuckets(
      df: DataFrame,
      colName: String,
      q: Int,
      outCol: String = "bucket",
      approxBounds: Boolean = false, // sketch bounds: the continuous-column scale path
      accuracy: Int = 10000
  ): DataFrame = {
    require(q >= 2, s"quantileBuckets: need q >= 2, got $q")
    percentileBounds(df, colName, (1 until q).map(_ / q.toDouble),
        approxBounds, accuracy) match {
      case None => df.withColumn(outCol, lit(null).cast(LongType))
      case Some(bounds) =>
        val x = col(colName).cast(DoubleType)
        val bucket = bounds.map(b => when(x >= b, 1L).otherwise(0L))
          .reduce(_ + _)
        df.withColumn(outCol, when(x.isNull, lit(null).cast(LongType))
          .otherwise(bucket))
    }
  }

  /** Empirical-CDF transform: adds `outCol = #rows-with-smaller-value /
    * (n − 1)` — SQL `percent_rank`, ties sharing the tie group's
    * minimum rank — the scale-free normalization that puts quality
    * scores from heterogeneous sources on one [0, 1] axis before
    * cross-source curation cuts. Nulls rank null; a single-row (or
    * single-value) column ranks 0.
    *
    * Shape: the below-count reduces over the value HISTOGRAM (the
    * [[numeric]] convention), and the prefix sum over that histogram is
    * TWO-LEVEL so no task ever sees the whole column: values bucket by
    * range into ≤ `buckets` coarse bins (monotonic in v, so bin order =
    * value order), per-bin totals collect as driver metadata (≤
    * `buckets` longs — two metadata aggregations, the [[winsorize]]
    * convention), and the within-bin running sum is a Window
    * PARTITIONED BY bin — every bin's prefix runs in parallel, seeded
    * with its driver-computed offset. A flat `Window.orderBy(v)` here
    * — or SQL `percent_rank()` itself — funnels all |distinct| values
    * (≈ all rows for a continuous column) through one task; measured
    * 2.3 s → this shape on 600k-distinct lineitem prices. The per-row
    * assignment is then a shuffle join on the 8-byte value. The rank
    * ratio is one division of exact longs, so any engine reproduces
    * the doubles bit-for-bit.
    */
  def percentRank(
      df: DataFrame,
      colName: String,
      outCol: String = "pct_rank",
      buckets: Int = 1024
  ): DataFrame = {
    require(buckets > 0, s"percentRank: buckets must be positive, got $buckets")
    val x = col(colName).cast(DoubleType)
    // materialize the histogram ONCE (localCheckpoint, the Dedup
    // convention): it feeds the bounds aggregate, the bin totals, the
    // within-bin window AND the rank join — left lazy, the corpus scan
    // + histogram shuffle re-run for each (measured: all of
    // percent_rank's 2.2 s at sf0.1, not the prefix sum). Size is
    // bounded by |distinct values|, the operator's working set by
    // construction.
    val hist = df.filter(x.isNotNull).groupBy(x.as("v")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val bounds = hist.agg(min(col("v")).as("mn"), max(col("v")).as("mx")).head()
    if (bounds.isNullAt(0)) {
      // no non-null values: every row ranks null (nothing to rank against)
      return df.withColumn(outCol, lit(null).cast(DoubleType))
    }
    val (mn, mx) = (bounds.getDouble(0), bounds.getDouble(1))
    // bin assignment is monotonic in v; a degenerate range (single
    // distinct value, or min == max) collapses to one bin
    val width = (mx - mn) / buckets
    val bin =
      if (width > 0)
        least(floor((col("v") - lit(mn)) / lit(width)), lit(buckets - 1L))
          .cast(LongType)
      else lit(0L)
    val binned = hist.withColumn("_b", bin)
    // per-bin totals -> cumulative offsets: driver metadata, ≤ buckets rows
    val binTotals = binned.groupBy("_b").agg(sum(col("cnt")).as("_bn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = binTotals.map(_._1)
      .zip(binTotals.map(_._2).scanLeft(0L)(_ + _))
    val total = binTotals.map(_._2).sum
    // offsets rejoin as a broadcast (≤ buckets rows) — a CASE chain over
    // 1024 bins would be O(buckets) per histogram row and codegen-hostile
    import df.sparkSession.implicits._
    val offsetDf = broadcast(offsets.toSeq.toDF("_b", "_off"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_b").orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val below = binned
      .withColumn("_wb", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .join(offsetDf, Seq("_b"))
      .select(col("v"), (col("_off") + col("_wb")).as("_below"),
        lit(total).as("_n"))
    df.join(below, x === col("v"), "left")
      .withColumn(outCol,
        when(x.isNull, lit(null).cast(DoubleType))
          .when(col("_n") > 1L,
            col("_below").cast(DoubleType) / (col("_n") - 1L).cast(DoubleType))
          .otherwise(lit(0.0)))
      .drop("v", "_below", "_n")
  }

  /** Per-GROUP percent rank: [[percentRank]] computed independently
    * within each `groupCols` stratum — the within-source score
    * normalization that makes quality cuts comparable across domains
    * (a 90th-percentile doc IN ITS SOURCE stays 90th-percentile no
    * matter how the sources' absolute scales differ).
    *
    * Shape: one histogram keyed by (group, value), then BOTH running
    * below-counts and group totals ride one window exchange partitioned
    * by the group — strata rank in parallel, and only histogram rows
    * (Σ per-group distincts) flow through it. The per-group prefix runs
    * in ONE task per stratum: right when strata are numerous and
    * per-stratum value cardinality is bounded (the domain/language
    * split this exists for); a single near-continuous stratum is the
    * degenerate case [[percentRank]]'s two-level bucketing handles —
    * use that per stratum instead. Rank ratio is the same exact-long
    * division, engine-reproducible bit-for-bit.
    */
  def percentRankByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      colName: String,
      outCol: String = "pct_rank"
  ): DataFrame = {
    require(groupCols.nonEmpty, "percentRankByGroup requires group columns")
    val x = col(colName).cast(DoubleType)
    val gs = groupCols.map(col)
    val hist = df.filter(x.isNotNull)
      .groupBy(gs :+ x.as("_vx"): _*).agg(count(lit(1)).as("cnt"))
    val wBelow = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy("_vx")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(gs: _*)
    val below = hist
      .withColumn("_below", coalesce(sum(col("cnt")).over(wBelow), lit(0L)))
      .withColumn("_n", sum(col("cnt")).over(wAll))
      .select(gs ++ Seq(col("_vx"), col("_below"), col("_n")): _*)
    df.withColumn("_vx", x)
      .join(below, groupCols :+ "_vx", "left")
      .withColumn(outCol,
        when(x.isNull, lit(null).cast(DoubleType))
          .when(col("_n") > 1L,
            col("_below").cast(DoubleType) / (col("_n") - 1L).cast(DoubleType))
          .otherwise(lit(0.0)))
      .drop("_vx", "_below", "_n")
  }

  /** Robust scaling `(x − median) / iqr` — the outlier-insensitive
    * normalization (scikit-learn's RobustScaler) for columns where mean
    * and σ are dragged by the tails the [[outlierFlags]] pass finds.
    * Median and quartiles come from the same exact histogram pass as
    * [[winsorize]] (driver metadata, one aggregate); the transform is
    * one narrow fixed-order IEEE division per row, so an external
    * engine reproduces the exact scaled values. A zero IQR (no spread)
    * maps every value to 0.0 — a constant column carries no signal at
    * any scale (the [[standardizeVectors]] dead-dimension convention);
    * nulls pass through null.
    */
  def robustScale(
      df: DataFrame,
      colName: String,
      outCol: String = "scaled",
      approxBounds: Boolean = false, // sketch bounds: the continuous-column scale path
      accuracy: Int = 10000
  ): DataFrame = {
    percentileBounds(df, colName, Seq(0.25, 0.5, 0.75),
        approxBounds, accuracy) match {
      case None => df.withColumn(outCol, lit(null).cast(DoubleType))
      case Some(Seq(q1, med, q3)) =>
        val iqr = q3 - q1
        val x = col(colName).cast(DoubleType)
        df.withColumn(outCol,
          when(x.isNull, lit(null).cast(DoubleType))
            .otherwise(if (iqr == 0.0) lit(0.0) else (x - med) / iqr))
      case Some(other) => throw new IllegalStateException(
        s"robustScale: expected 3 bounds, got $other")
    }
  }

  /** Flag outliers in `colName` by BOTH standard recipes — z-score
    * (|x − mean| > t·σ, population σ) and Tukey fences (outside
    * [q1 − k·iqr, q3 + k·iqr]) — as two boolean columns (`z_outlier`,
    * `iqr_outlier`; nulls flag null). Stats are one aggregate pass:
    * Σx and Σx² accumulate in DECIMAL (`sumScale` ≥ the data's decimal
    * places, `2·sumScale` for the squares — doubles are rounded there
    * first, the only rounding in the chain), quartiles ride the
    * [[exactPercentiles]] histogram; both reduce order-independently.
    * The derived mean and σ are QUANTIZED to 6 dp (half-away, DuckDB's
    * `round`): the one step engines can disagree on is the big
    * DECIMAL→DOUBLE cast (correctly-rounded in the JVM, double-divided
    * in some engines — a 1-ulp wobble), and quantizing the derived
    * stats makes the flag boundary bit-identical everywhere, so an
    * external engine reproduces the exact flag set, not an
    * approximation of it. The flag pass itself is narrow: stats are
    * driver metadata, no join, no second shuffle.
    */
  def outlierFlags(
      df: DataFrame,
      colName: String,
      zThreshold: Double = 3.0,
      iqrK: Double = 1.5,
      sumScale: Int = 4,
      approxBounds: Boolean = false, // sketch quartiles: the continuous-column scale path
      accuracy: Int = 10000
  ): DataFrame = {
    val x = col(colName).cast(DoubleType)
    val sumT = DecimalType(38, sumScale)
    val sqScale = math.min(2 * sumScale, 18)
    val sqT = DecimalType(38, sqScale)
    // ONE data pass either way. Exact: moments reduce over the value
    // HISTOGRAM (Σ round(v,s)·cnt ≡ the row-level decimal sum, round
    // being per-value) and the quartiles come from distributed
    // selection over the SAME checkpointed histogram — the scan and the
    // value shuffle run once, and no stage funnels the distinct-value
    // set into one task. Approx: no histogram at all — moments sum raw
    // rows and the quartiles ride approx_percentile's bounded-memory
    // sketch in the SAME aggregate.
    val (statsRow, quartilesOpt) = if (approxBounds) {
      val r = df.select(x.as("v")).agg(
        count(col("v")).as("n"),
        sum(round(col("v"), sumScale).cast(sumT)).as("s"),
        sum(round(col("v") * col("v"), sqScale).cast(sqT)).as("ss"),
        expr(s"approx_percentile(v, array(0.25, 0.75), $accuracy)").as("qs"))
        .collect()(0)
      (r, if (r.isNullAt(3)) None else Some(r.getSeq[Double](3)))
    } else {
      val hist = df.select(lit("c").as("g"), x.as("v"))
        .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val r = hist.agg(
        sum(when(col("v").isNotNull, col("cnt"))).as("n"),
        sum(round(col("v"), sumScale).cast(sumT) * col("cnt")).as("s"),
        sum(round(col("v") * col("v"), sqScale).cast(sqT) * col("cnt")).as("ss"),
        count(when(col("v").isNotNull, lit(1))).as("d"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
        .collect()(0)
      val qs = if (r.isNullAt(0) || r.getLong(0) == 0L) None else {
        val n = r.getLong(0)
        val probs = Seq(0.25, 0.75)
        val stats = Map("c" -> GroupStats(n, r.getLong(3),
          r.getDouble(4), r.getDouble(5)))
        val sel = groupedOrderStats(hist.filter(col("v").isNotNull),
          stats, Map("c" -> ranksFor(n, probs)))
        Some(interpolateRanks(n, probs, rk => sel(("c", rk))))
      }
      (r, qs)
    }
    if (statsRow.isNullAt(0) || statsRow.getLong(0) == 0 || quartilesOpt.isEmpty) {
      df.withColumn("z_outlier", lit(null).cast(BooleanType))
        .withColumn("iqr_outlier", lit(null).cast(BooleanType))
    } else {
      val n = statsRow.getLong(0)
      def round6(d: Double): Double =
        java.math.BigDecimal.valueOf(d)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      val s = statsRow.getDecimal(1).doubleValue()
      val ss = statsRow.getDecimal(2).doubleValue()
      val mean = round6(s / n)
      val variance = math.max(0.0, ss / n - (s / n) * (s / n))
      val std = round6(math.sqrt(variance))
      val Seq(q1, q3) = quartilesOpt.get
      val iqr = q3 - q1
      val lo = q1 - iqrK * iqr
      val hi = q3 + iqrK * iqr
      df.withColumn("z_outlier",
          when(x.isNull, lit(null).cast(BooleanType))
            .otherwise(abs(x - mean) > zThreshold * std))
        .withColumn("iqr_outlier",
          when(x.isNull, lit(null).cast(BooleanType))
            .otherwise(x < lo || x > hi))
    }
  }

  /** Key-concentration diagnostic — the "do I need to salt this key?"
    * report before a big join/groupBy: the top-`k` hottest keys with
    * exact counts, each key's share of all rows, and the cumulative
    * share through that rank. A top-1 share near a partition's worth of
    * the data means the shuffle on this key funnels into one task
    * (route it through [[graft.engine.Partitioning.saltedJoin]] or cap
    * it with [[Sampling.quotaPerGroup]]); a flat curve means plain hash
    * partitioning is fine. Null keys are excluded (they don't join).
    *
    * Scale shape: ONE map-side-combined key histogram; the total and
    * the top-k cut both reduce the histogram (TakeOrdered, ties broken
    * by ascending key — no global sort), and rank/cumulative windows
    * run on the ≤ k-row result. Shares are exact-integer IEEE
    * divisions, engine-reproducible.
    */
  def keyConcentration(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    require(k > 0, s"keyConcentration: k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val hist = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast(StringType).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = hist.agg(coalesce(sum(col("cnt")), lit(0L)).as("_tot"))
    val top = hist.orderBy(col("cnt").desc, col("key").asc).limit(k)
    // rank + running count over the k-row cut: a single bounded partition
    val w = Window.orderBy(col("cnt").desc, col("key").asc)
    top
      .withColumn("rank", row_number().over(w).cast(IntegerType))
      .withColumn("_cum", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(
        col("rank"), col("key"), col("cnt"),
        (col("cnt").cast(DoubleType) / col("_tot").cast(DoubleType)).as("share"),
        (col("_cum").cast(DoubleType) / col("_tot").cast(DoubleType)).as("cum_share"))
  }

  /** Per-group EXACT embedding centroid in e6 integer space — domain/
    * source-level embedding summaries (the SemDeDup cluster-mean and
    * drift-reference primitive) with engine-reproducible arithmetic:
    * vectors floor-quantize to ×10⁶ BIGINT, per-position sums are
    * exact, and the mean is one trunc-toward-zero integer division
    * (Spark `div` ≡ DuckDB `//`, pinned for negative sums by the
    * k-means family). Output: `(<groupCol>, pos, sum_e6, n, mean_e6)`.
    * Rows with a null group or vector drop.
    *
    * Scale shape: one narrow quantize + posexplode, then a single
    * map-side-combined aggregation whose key space is groups × dim —
    * histogram-sized rows shuffle, never vectors.
    */
  def groupCentroidsE6(
      df: DataFrame,
      groupCol: String,
      vecCol: String
  ): DataFrame =
    df.filter(col(groupCol).isNotNull && col(vecCol).isNotNull)
      .select(col(groupCol).as("_g"),
        posexplode(transform(col(vecCol),
          v => floor(v.cast(DoubleType) * 1000000d).cast(LongType)))
          .as(Seq("pos", "_x")))
      .groupBy(col("_g"), col("pos"))
      .agg(sum(col("_x")).as("sum_e6"), count(lit(1)).as("n"))
      .select(col("_g").as(groupCol), col("pos").cast(IntegerType).as("pos"),
        col("sum_e6"), col("n"),
        expr("CAST(sum_e6 div n AS BIGINT)").as("mean_e6"))

  /** Rank correlation (Spearman ρ + Kendall τ-a) between two numeric
    * measures per group — the ranker-agreement diagnostic ("do two
    * quality scores order a source's documents the same way"; compare
    * retrieval rankers per query by keying the group on the query id).
    * Both coefficients are EXACT scaled integers over deterministic
    * total orders: ranks are `row_number` ascending by `(value, id)` —
    * the id tiebreak makes tied scores a pinned order, so the operator
    * compares ORDERINGS, replayable on any engine. Spearman's
    * `ρ = 1 − 6·Σd²/(n(n²−1))` and Kendall's
    * `τ = (C − D)/(n(n−1)/2) = (n(n−1) − 4D)/(n(n−1))` (ranks are
    * permutations, so C + D = n(n−1)/2 and only the discordant count D
    * is measured). Both can be negative: Spark `div` and DuckDB `//`
    * truncate toward zero identically (pinned by the kappa family).
    * Output: `(<groupCol>, n, sum_d2, n_discordant, spearman_e6,
    * kendall_e6)`, groups with n < 2 dropped (undefined correlation).
    *
    * Scale shape: NO pair join anywhere (the round-10 verdict's
    * scale-killer is gone). The discordant count is DISTRIBUTED
    * INVERSION COUNTING over the rank permutation — sort by x-rank,
    * count y-rank inversions:
    *
    *  1. SEED: split each group's x-rank order into blocks of
    *     `seedBlockSize`; each block's within-block inversions come
    *     from ONE bounded [[graft.plans.ArrayInversions]] merge-sort
    *     kernel (collect_list is capped at seedBlockSize elements —
    *     never a group's rows).
    *  2. SAME-y-BUCKET CROSS-BLOCK pairs: blocks order by block id, so
    *     these are strict inversions of the BLOCK-ID sequence in
    *     y-rank order within each y-bucket — one more bounded kernel
    *     pass (`_ry` is a permutation, so a `(g, bky)` bucket holds ≤
    *     seedBlockSize rows; strictness makes same-block pairs, which
    *     the seed already counted, contribute zero).
    *  3. CROSS-GRID pairs (different block AND bucket): both rank
    *     orders are determined at (x-block, y-bucket) GRID granularity
    *     — the count reduces entirely over the cell HISTOGRAM `(g,
    *     blk, bky, count)`. ⌈log₂(maxBlocks)⌉ width-doubling merge
    *     rounds, each ONE hash aggregate over histogram rows plus a
    *     suffix sum of `rightCount × leftCountsInLaterBuckets` over ≤
    *     maxN/seedBlockSize bucket rows per `(g, pair)` — data rows
    *     never re-enter after the one histogram aggregate.
    *
    * Work is O(n log n) worst-case — the cost of a sort, the floor for
    * exact Kendall — with the log factor paid over HISTOGRAM rows
    * (≤ min(n, blocks × buckets) cells), not data rows. Per-task
    * memory is bounded by seedBlockSize in the seed and bucket
    * kernels; the rank assignment is ADAPTIVE on the measured largest
    * group: ≤ `rankWindowThreshold` (default 2²² rows) takes one plain
    * per-group `row_number` window — a single task sorting ≤ 4M
    * 32-byte rows, cheaper than extra stages — and larger groups ride
    * the [[graft.operators.Sampling.withinGroupRanks]] two-level
    * prefix (key-range balanced) so no task ever sorts a whole group.
    * Beyond the threshold no window partition spans a group anywhere —
    * the only `(g, pair)`-wide partitions carry bucket-histogram rows.
    * A billion-row group is one bucketed rank pass, two bounded kernel
    * aggregates, and ~18 rounds over the cell grid, not a 10¹⁸ pair
    * join. Products ride DECIMAL(38,0) (n³·10⁶ passes Long at
    * n ≈ 3·10³).
    */
  def rankCorrelationByGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      xCol: String,
      yCol: String,
      seedBlockSize: Int = 4096,
      rankWindowThreshold: Long = RankWindowThreshold
  ): DataFrame = {
    require(seedBlockSize >= 2 && seedBlockSize <= (1 << 20),
      s"rankCorrelationByGroup: seedBlockSize must be in [2, 2^20], got $seedBlockSize")
    import org.apache.spark.sql.expressions.Window
    val vals = df
      .select(col(groupCol).cast(StringType).as("_g"), col(idCol).as("_id"),
        col(xCol).cast(LongType).as("_x"), col(yCol).cast(LongType).as("_y"))
      .filter(col("_g").isNotNull && col("_id").isNotNull &&
        col("_x").isNotNull && col("_y").isNotNull)
    // the largest group's size gates the rank strategy AND bounds the
    // merge rounds — one metadata aggregate, before any ranking
    val maxN: Long = Option(
      vals.groupBy(col("_g")).count()
        .agg(max(col("count"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    if (maxN == 0L) {
      // no rows: empty result with the contract schema
      import df.sparkSession.implicits._
      return Seq.empty[(String, Long, Long, Long, Long, Long)]
        .toDF(groupCol, "n", "sum_d2", "n_discordant",
          "spearman_e6", "kendall_e6")
    }
    // rank assignment, ADAPTIVE on the measured group bound: small
    // groups take the plain per-group row_number window (one task per
    // group sorts ≤ maxN rows — fine precisely because maxN is small,
    // and half the stage count); large groups ride the SAME two-level
    // machinery as the merge rounds
    // ([[graft.operators.Sampling.withinGroupRanks]], the percentRank
    // design) so no task ever sorts a whole group. Tie-break by _id
    // keeps both orders total either way.
    val ranked = (if (maxN <= rankWindowThreshold) {
      val wx = Window.partitionBy(col("_g")).orderBy(col("_x"), col("_id"))
      val wy = Window.partitionBy(col("_g")).orderBy(col("_y"), col("_id"))
      vals
        .withColumn("_rx", row_number().over(wx).cast(LongType))
        .withColumn("_ry", row_number().over(wy).cast(LongType))
        .select(col("_g"), col("_rx"), col("_ry"))
    } else {
      val rankedX = graft.operators.Sampling.withinGroupRanks(
        vals.select(col("_g"), col("_x").as("_k"), col("_id"),
          col("_y")), 1024, tieCols = Seq("_id")).get
      graft.operators.Sampling.withinGroupRanks(
          rankedX.select(col("_g"), col("_y").as("_k"), col("_id"),
            col("_rank").as("_rx")), 1024, tieCols = Seq("_id")).get
        .select(col("_g"), col("_rx"), col("_rank").as("_ry"))
    })
      // reused by stats + the seed pass + every merge round: cut the
      // lineage once (the pageRankScaled discipline)
      .localCheckpoint()
    val d38 = DecimalType(38, 0)
    val stats = ranked.groupBy(col("_g"))
      .agg(count(lit(1)).as("n"),
        sum(((col("_rx") - col("_ry")) * (col("_rx") - col("_ry"))).cast(d38))
          .cast(LongType).as("sum_d2"))
    // ---- discordant count D by distributed inversion counting ----
    import org.apache.spark.sql.graft.ColumnBridge
    // Every inversion pair (rx_i < rx_j, ry_i > ry_j) is counted exactly
    // once by WHERE it lands on the (x-block, y-bucket) grid
    // (blk = (_rx−1) div B, bky = (_ry−1) div B):
    //   1. SAME x-block  → the seed kernel (within-block ry inversions)
    //   2. DIFFERENT block, SAME y-bucket → different blocks order by
    //      blk, so these are STRICT inversions of the blk sequence in
    //      ry order within the bucket — one more bounded kernel pass
    //      (≤ B rows per (g, bky): _ry is a permutation)
    //   3. DIFFERENT block AND bucket → both orders are determined at
    //      GRID granularity, so the count reduces over the (g, blk,
    //      bky) cell HISTOGRAM: log₂(maxBlocks) merge rounds, each one
    //      hash-aggregate over histogram rows + a suffix sum over
    //      ≤ maxN/B bucket rows per (g, pair) — rows never re-enter
    //      after the histogram aggregate.
    val blkOf = expr(s"(_rx - 1) div $seedBlockSize")
    val bkyOf = expr(s"(_ry - 1) div $seedBlockSize")
    // 1. seed: ry-sequence inversions within each x-block (array ≤ B)
    val seedRySeq = transform(
      array_sort(collect_list(struct(col("_rx"), col("_ry")))),
      s => s.getField("_ry"))
    val seedD = ranked
      .groupBy(col("_g"), blkOf.as("_blk"))
      .agg(ColumnBridge.column(graft.plans.ArrayInversions(
        ColumnBridge.expression(seedRySeq))).as("_d"))
      .select(col("_g"), col("_d"))
    // 2. blk-sequence inversions in ry order within each y-bucket —
    // strict, so same-block pairs (already counted by the seed) add 0
    val bktBlkSeq = transform(
      array_sort(collect_list(struct(col("_ry"), col("_blk")))),
      s => s.getField("_blk"))
    val bucketD = ranked
      .withColumn("_blk", blkOf)
      .groupBy(col("_g"), bkyOf.as("_bky"))
      .agg(ColumnBridge.column(graft.plans.ArrayInversions(
        ColumnBridge.expression(bktBlkSeq))).as("_d"))
      .select(col("_g"), col("_d"))
    // 3. cross-grid: ONE cell histogram, then width-doubling rounds of
    // (right-cell count) × (left-span counts in strictly later buckets)
    val cells = ranked
      .groupBy(col("_g"), blkOf.as("_blk"), bkyOf.as("_bky"))
      .agg(count(lit(1)).as("_c"))
      .localCheckpoint() // read once per round; rows never again
    val maxBlocks = (maxN + seedBlockSize - 1) / seedBlockSize
    var partials = Seq(seedD, bucketD)
    var w = 1L
    while (w < maxBlocks) {
      val winS = Window.partitionBy(col("_g"), col("_pair"))
        .orderBy(col("_bky"))
        .rowsBetween(1, Window.unboundedFollowing)
      val roundD = cells
        .withColumn("_pair", expr(s"_blk div ${2L * w}"))
        .withColumn("_side", expr(s"(_blk div $w) % 2"))
        .groupBy(col("_g"), col("_pair"), col("_bky"))
        .agg(sum(when(col("_side") === 0L, col("_c")).otherwise(0L)).as("_l"),
          sum(when(col("_side") === 1L, col("_c")).otherwise(0L)).as("_r"))
        .withColumn("_lafter", coalesce(sum(col("_l")).over(winS), lit(0L)))
        .select(col("_g"), (col("_r") * col("_lafter")).as("_d"))
      partials = partials :+ roundD
      w *= 2L
    }
    val disc = partials.reduce(_ unionByName _)
      .groupBy(col("_g")).agg(sum(col("_d")).as("_nd"))
    stats.join(disc, Seq("_g"), "left")
      .withColumn("n_discordant", coalesce(col("_nd"), lit(0L)))
      .filter(col("n") >= 2)
      .select(col("_g").as(groupCol), col("n"), col("sum_d2"), col("n_discordant"),
        expr("CAST(((CAST(n AS DECIMAL(38,0)) * (n*n - 1) " +
          "- 6 * CAST(sum_d2 AS DECIMAL(38,0))) * 1000000) " +
          "div (CAST(n AS DECIMAL(38,0)) * (n*n - 1)) AS BIGINT)")
          .as("spearman_e6"),
        expr("CAST(((CAST(n AS DECIMAL(38,0)) * (n - 1) " +
          "- 4 * CAST(n_discordant AS DECIMAL(38,0))) * 1000000) " +
          "div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)")
          .as("kendall_e6"))
  }

  /** Exact ROC-AUC per group via the Mann–Whitney U pair statistic —
    * "how well does this score separate the keep class from the drop
    * class, per source": AUC = P(score⁺ > score⁻) + ½·P(=), computed
    * WITHOUT a pair join from the score histogram. Per distinct score
    * value: `(pos, neg)` class counts; walking values ascending,
    * `U₂ = Σ pos·(2·cumNegBelow + negAtSame)` counts each
    * positive-negative pair twice (ties once), so
    * `auc_ppm = U₂·10⁶ div (2·n⁺·n⁻)` — exact integers end to end,
    * every quantity non-negative (floor ≡ trunc). Groups missing a
    * class drop (AUC undefined). Output: `(<groupCol>, n_pos BIGINT,
    * n_neg BIGINT, auc_ppm BIGINT)`.
    *
    * Scale shape: ONE map-side-combined aggregate to the per-group
    * score histogram; the cumulative walk is a window over HISTOGRAM
    * rows. Scores are integer measures by contract (lengths, e6-scaled
    * qualities) — per-group distinct-score cardinality bounds the
    * window partition, so quantize continuous scores first (the
    * histogram convention); sums ride DECIMAL(38,0).
    */
  def aucByGroup(
      df: DataFrame,
      groupCol: String,
      label: Column,
      score: Column
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    val hist = df
      .select(col(groupCol).cast(StringType).as("_g"),
        label.cast(BooleanType).as("_y"), score.cast(LongType).as("_v"))
      .filter(col("_g").isNotNull && col("_y").isNotNull && col("_v").isNotNull)
      .groupBy(col("_g"), col("_v"))
      .agg(sum(when(col("_y"), 1L).otherwise(0L)).as("_pos"),
        sum(when(col("_y"), 0L).otherwise(1L)).as("_neg"))
    val w = Window.partitionBy(col("_g")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("_cumneg", coalesce(sum(col("_neg")).over(w), lit(0L)))
      .groupBy(col("_g"))
      .agg(sum(col("_pos")).as("n_pos"), sum(col("_neg")).as("n_neg"),
        sum(col("_pos").cast(d38) *
          (lit(2L) * col("_cumneg") + col("_neg")).cast(d38)).as("_u2"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .select(col("_g").as(groupCol), col("n_pos"), col("n_neg"),
        expr("CAST((_u2 * 1000000) div (2 * CAST(n_pos AS DECIMAL(38,0)) " +
          "* n_neg) AS BIGINT)").as("auc_ppm"))
  }

  /** Calibration table for a score against a binary outcome — the
    * reliability diagram behind [[aucByGroup]]'s single number ("the
    * top score decile is 92 % keep-class; the bottom is 3 %"): rows
    * bin into `nBins` EXACT score quantiles ([[quantileBuckets]]
    * thresholds — engine-replayable cut), and each bin reports its
    * size, positive count, positive rate, and mean score, all exact
    * scaled integers (`div` ≡ `//` trunc parity; scores enter the
    * mean via a DECIMAL sum). Output: `(bin BIGINT, n, n_pos,
    * pos_rate_ppm, mean_score_e6)` — AUC says the ORDER is right;
    * this says whether the score's LEVELS mean anything.
    *
    * Scale shape: the bin thresholds ride [[quantileBuckets]]'s
    * distributed selection (histogram + bucket metadata), then ONE
    * map-side-combined aggregate over ≤ nBins keys. Nothing
    * corpus-scale survives the first aggregate.
    */
  def calibrationTable(
      df: DataFrame,
      label: Column,
      scoreCol: String,
      nBins: Int
  ): DataFrame = {
    val d38 = DecimalType(38, 0)
    val rows = df
      .select(label.cast(BooleanType).as("_y"),
        col(scoreCol).cast(LongType).as("_v"))
      .filter(col("_y").isNotNull && col("_v").isNotNull)
    quantileBuckets(rows, "_v", nBins, outCol = "bin")
      .filter(col("bin").isNotNull)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_y"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("_v").cast(d38)).as("_sv"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("CAST((CAST(n_pos AS DECIMAL(38,0)) * 1000000) div n AS BIGINT)")
          .as("pos_rate_ppm"),
        expr("CAST((_sv * 1000000) div n AS BIGINT)").as("mean_score_e6"))
  }

  /** Distribution shift of an integer measure, each group vs a
    * REFERENCE group — the numeric sibling of the token-histogram
    * drift family: per group, the exact two-sample Kolmogorov–Smirnov
    * statistic `KS = max|F_g − F_ref|` and the exact 1-Wasserstein
    * (earth-mover) distance `W₁ = ∫|F_g − F_ref| dv`, both over the
    * merged value grid with CDFs as cross-normalized integer counts
    * (`|cum_g·n_ref − cum_ref·n_g|` — no division until the final
    * scaled output, so both statistics replay bit-for-bit). W₁ is in
    * VALUE units (chars, tokens). Output per non-reference group:
    * `(<groupCol>, n, n_ref, ks_ppm, w1_e6)`; groups or a reference
    * with zero rows drop (the distance to nothing is undefined).
    *
    * Scale shape: one map-side-combined aggregate to `(g, v, c)`
    * histograms; the reference histogram is replicated once per group
    * (histogram rows × #groups — metadata next to the corpus) and
    * every later stage windows HISTOGRAM rows per group. Integer
    * measures by contract — quantize continuous values first, which
    * also bounds the per-group window partition. Cross products ride
    * DECIMAL(38,0) (range·n_g·n_ref ≤ 10³⁸ holds past petabyte rows).
    */
  def distributionShift(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      refGroup: String
  ): DataFrame = {
    val hist = df
      .select(col(groupCol).cast(StringType).as("_g"),
        col(valueCol).cast(LongType).as("_v"))
      .filter(col("_g").isNotNull && col("_v").isNotNull)
      .groupBy(col("_g"), col("_v")).agg(count(lit(1)).as("_c"))
    val ref = hist.filter(col("_g") === refGroup)
      .select(col("_v"), col("_c").as("_cr"))
    val oth = hist.filter(col("_g") =!= refGroup)
    shiftFromHistograms(oth, ref, groupCol)
  }

  /** [[distributionShift]]'s histogram core — per-group KS + W1 given
    * pre-built value histograms: `oth` as `(_g, _v, _c)` and the
    * reference as `(_v, _cr)`. Split out so the streaming monitor can
    * replay a batch's histogram against a COMMITTED reference state
    * (the drift-stream convention) without re-deriving the reference.
    */
  private[graft] def shiftFromHistograms(
      oth: DataFrame,
      ref: DataFrame,
      groupCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = DecimalType(38, 0)
    val groups = broadcast(oth.select(col("_g")).distinct())
    val refX = groups.crossJoin(ref)
    val merged = refX.join(oth, Seq("_g", "_v"), "full_outer")
      .select(col("_g"), col("_v"),
        coalesce(col("_c"), lit(0L)).as("_cg"),
        coalesce(col("_cr"), lit(0L)).as("_crr"))
    val wCum = Window.partitionBy(col("_g")).orderBy(col("_v"))
    val wAll = Window.partitionBy(col("_g"))
    val walked = merged
      .withColumn("_cumg", sum(col("_cg")).over(wCum))
      .withColumn("_cumr", sum(col("_crr")).over(wCum))
      .withColumn("_ng", sum(col("_cg")).over(wAll))
      .withColumn("_nr", sum(col("_crr")).over(wAll))
      .withColumn("_gap",
        coalesce(lead(col("_v"), 1).over(wCum) - col("_v"), lit(0L)))
      .withColumn("_diff",
        abs(col("_cumg").cast(d38) * col("_nr") -
          col("_cumr").cast(d38) * col("_ng")))
    walked.groupBy(col("_g"))
      .agg(max(col("_ng")).as("n"), max(col("_nr")).as("n_ref"),
        max(col("_diff")).as("_ksn"),
        sum(col("_diff") * col("_gap").cast(d38)).as("_w1n"))
      .filter(col("n") > 0 && col("n_ref") > 0)
      .select(col("_g").as(groupCol), col("n"), col("n_ref"),
        expr("CAST((_ksn * 1000000) div (CAST(n AS DECIMAL(38,0)) * n_ref) " +
          "AS BIGINT)").as("ks_ppm"),
        expr("CAST((_w1n * 1000000) div (CAST(n AS DECIMAL(38,0)) * n_ref) " +
          "AS BIGINT)").as("w1_e6"))
  }
}
