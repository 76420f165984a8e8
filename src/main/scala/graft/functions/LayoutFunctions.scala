package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Data-LAYOUT keys for scan pruning at scale. A 100 TB table is only
 * fast if most queries never read most files: sorting (or
 * range-partitioning the final write) by an interleaved-bit key
 * co-locates rows that are close in EVERY dimension, so min/max file
 * statistics prune multi-dimensional predicates — the classic Z-order
 * clustering trick (public technique: Morton 1966 ordering; used by
 * analytic stores for multi-column data skipping).
 *
 * Pure integer bit arithmetic (shift/mask/add), codegen'd, no shuffle —
 * the ordering/partitioning that CONSUMES the key decides the layout
 * cost. Any engine replays the key bit-for-bit.
 */
object LayoutFunctions {

  /** Morton/Z-order key: interleave the low `bits` bits of two
    * non-negative integer dimensions — x in the even result bits, y in
    * the odd. Inputs must be pre-quantized by the caller (bucket ids,
    * epoch buckets, quantized coordinates); bits above `bits` are
    * ignored (documented truncation), negatives are a caller error the
    * key does not mask (two's-complement high bits are dropped like any
    * other overflow, keeping the expression branch-free).
    *
    * The expression is a flat sum of `2·bits` shift/mask terms — wide
    * but branchless and fully inside whole-stage codegen; `bits ≤ 31`
    * keeps the result in the positive BIGINT range.
    */
  /** 3-D Morton key: interleave the low `bits` bits of three
    * pre-quantized dimensions (x stride-3 offset 0, y offset 1,
    * z offset 2) — the clustering key when queries slice THREE
    * dimensions at once (entity × time × value band). Same truncation
    * contract as [[zorderKey]]; `bits ≤ 20` keeps 3·bits < 63.
    */
  def zorderKey3(x: Column, y: Column, z: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"zorderKey3: bits must be in [1, 20], got $bits")
    val (xl, yl, zl) = (x.cast(LongType), y.cast(LongType), z.cast(LongType))
    val terms =
      (0 until bits).map(i => shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 3 * i)) ++
      (0 until bits).map(i => shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 3 * i + 1)) ++
      (0 until bits).map(i => shiftleft(shiftright(zl, i).bitwiseAND(lit(1L)), 3 * i + 2))
    terms.reduce(_ + _)
  }

  /** 2-D Hilbert index of two non-negative pre-quantized dimensions —
    * tighter per-file bounds than [[zorderKey]] on box predicates (no
    * diagonal jumps). Native single-pass expression
    * (graft.plans.HilbertKey); same low-`order`-bits truncation
    * contract as the Morton key.
    */
  def hilbertKey(x: Column, y: Column, order: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.HilbertKey(
      ColumnBridge.expression(x.cast(LongType)),
      ColumnBridge.expression(y.cast(LongType)), order))
  }

  def zorderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zorderKey: bits must be in [1, 31], got $bits")
    val xl = x.cast(LongType)
    val yl = y.cast(LongType)
    val terms =
      (0 until bits).map(i => shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)) ++
      (0 until bits).map(i => shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    terms.reduce(_ + _)
  }
}
