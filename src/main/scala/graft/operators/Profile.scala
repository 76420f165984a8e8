package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Dataset profiling — the "know your data" pass a training pipeline runs
 * before committing 100 TB to a mix: per-column counts, null counts,
 * range, mean, and exact quartiles/p90 in ONE scan.
 *
 * Determinism across engines (this is oracle-gated, not approximate):
 *  - means accumulate in DECIMAL (order-independent — a double sum's
 *    value depends on reduction order across partitions) and divide once
 *    in double;
 *  - percentiles are Spark's EXACT `percentile` (sort-based), which
 *    shares its linear-interpolation definition with DuckDB's
 *    `quantile_cont` — verified value-identical on the driver gates. At
 *    100 TB exact percentiles of a single column are still one
 *    sort-shuffle of (value, count) pairs; swap in approx_percentile
 *    when a bounded error is acceptable (not oracle-able, so the gate
 *    uses the exact form).
 *
 * One `agg` row computes every column's stats in a single pass; `stack`
 * unpivots to the long (col_name, stats...) shape.
 */
object Profile {

  /** Numeric profile of `cols` (must be numeric): one row per column —
    * (col_name, n non-null, nulls, min, max, mean, p25, p50, p75, p90).
    * `sumScale` is the DECIMAL scale for the mean accumulator; keep it
    * at or above the data's decimal places so the cast is exact.
    */
  def numeric(df: DataFrame, cols: Seq[String], sumScale: Int = 2): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).cast(DoubleType).as(s"${c}__min"),
        max(col(c)).cast(DoubleType).as(s"${c}__max"),
        sum(col(c).cast(DecimalType(38, sumScale))).cast(DoubleType).as(s"${c}__sum"),
        expr(s"percentile($c, array(0.25, 0.5, 0.75, 0.9))").as(s"${c}__pct")
      )
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', ${c}__n, ${c}__nulls, ${c}__min, ${c}__max, ${c}__sum, ${c}__pct")
      .mkString(", ")
    one.selectExpr(
        s"stack(${cols.length}, $stacked) AS (col_name, n, nulls, mn, mx, sm, pct)")
      .select(
        col("col_name"),
        col("n"),
        col("nulls"),
        col("mn").as("min"),
        col("mx").as("max"),
        when(col("n") > 0, col("sm") / col("n")).as("mean"),
        element_at(col("pct"), 1).as("p25"),
        element_at(col("pct"), 2).as("p50"),
        element_at(col("pct"), 3).as("p75"),
        element_at(col("pct"), 4).as("p90"))
  }
}
