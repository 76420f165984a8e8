package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * 2-D Hilbert curve index (Hilbert 1891; the classic xy2d bit
 * transform) — the stronger sibling of [[graft.functions
 * .LayoutFunctions.zorderKey]] for layout clustering: the Hilbert
 * curve has no long diagonal jumps, so consecutive key ranges map to
 * tighter 2-D regions than Morton order and per-file min/max bounds
 * prune better on box predicates (why lakehouse OPTIMIZE
 * implementations offer Hilbert above Z-order).
 *
 * Loop form (validated bijective + unit-step adjacent in the spec):
 * for s = 2^(order−1) … 1: rx/ry = bit tests, d += s²·((3rx) XOR ry),
 * then the s-local rotate/reflect. Pure integer work; inputs truncate
 * to the low `order` bits (the zorderKey truncation contract);
 * `order ≤ 31` keeps d < 2⁶² in the positive BIGINT range. The oracle
 * replays the identical arithmetic as an unrolled CTE chain
 * (SparkEntry.hilbertStepsSql).
 *
 * Scale shape: a narrow codegen'd scalar (reference-object pattern);
 * the ordering/partitioning that CONSUMES the key decides layout cost.
 */
case class HilbertKey(left: Expression, right: Expression, order: Int)
    extends BinaryExpression {

  require(order >= 1 && order <= 31,
    s"graft_hilbert_key: order must be in [1, 31], got $order")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_key"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert_key requires BIGINT inputs, got ${left.dataType}, ${right.dataType}")

  def compute(x0: Long, y0: Long): Long = {
    val mask = (1L << order) - 1L
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def nullSafeEval(xv: Any, yv: Any): Any =
    compute(xv.asInstanceOf[Long], yv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hilbertKey", this, classOf[HilbertKey].getName)
    defineCodeGen(ctx, ev, (x, y) => s"$ref.compute($x, $y)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
