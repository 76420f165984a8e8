package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Exact minimum squared-L2 distance from an e6-scaled BIGINT vector to a
 * literal center set — the [[NearestCentroidE6]] kernel returning the
 * DISTANCE instead of the argmin id. One narrow per-row expression; the
 * center matrix rides a single `ctx.addReferenceObj` flat array, so the
 * tree stays O(1) in the number of centers and the loop is (C × dim)
 * tight long arithmetic.
 *
 * This is the per-round update primitive of k-center greedy selection
 * (`Similarity.kCenterGreedyE6`): with a 1-row matrix it prices the
 * newest center so a running `least(...)` column stays exact; with the
 * full selected set it prices a point against the whole cover.
 *
 * Overflow headroom matches the e6 contract: Σ(x−c)² fits BIGINT to
 * ~10⁴ dimensions at unit-scale embeddings. A null vector, wrong length,
 * or null element returns null — callers drop rows rather than ranking
 * garbage.
 */
case class MinSqDistE6(
    child: Expression,
    matrix: Seq[Long], // C × dim, row-major, e6-scaled
    dim: Int
) extends UnaryExpression {

  require(dim > 0, "dim must be positive")
  require(matrix.nonEmpty && matrix.length % dim == 0,
    s"matrix length ${matrix.length} not a multiple of dim $dim")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_min_sqdist_e6"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_min_sqdist_e6 requires ARRAY<BIGINT>, got $t")
  }

  @transient private lazy val matArr: Array[Long] = matrix.toArray

  /** The distance kernel: exact BIGINT squared-L2 per center, minimum
    * over the set. Returns null (boxed) for malformed vectors.
    */
  def minDist(vec: ArrayData): java.lang.Long = {
    val n = vec.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    var best = Long.MaxValue
    var base = 0
    while (base < matArr.length) {
      var acc = 0L
      var j = 0
      while (j < dim) {
        val d = vec.getLong(j) - matArr(base + j)
        acc += d * d
        j += 1
      }
      if (acc < best) best = acc
      base += dim
    }
    java.lang.Long.valueOf(best)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val r = minDist(input.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minSqDistE6", this,
      classOf[MinSqDistE6].getName)
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("minDist")
    ev.copy(code =
      org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
        new StringContext(
          s"""
             |${childGen.code}
             |boolean ${ev.isNull} = true;
             |long ${ev.value} = -1L;
             |if (!${childGen.isNull}) {
             |  java.lang.Long $boxed = $ref.minDist(${childGen.value});
             |  if ($boxed != null) {
             |    ${ev.isNull} = false;
             |    ${ev.value} = $boxed.longValue();
             |  }
             |}
             |""".stripMargin)).code())
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
