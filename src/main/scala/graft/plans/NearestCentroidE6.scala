package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Exact-integer argmin centroid assignment over e6-scaled BIGINT vectors
 * — the [[NearestCentroid]] pattern applied to the exact k-means path
 * (`Similarity.kmeansIterationExact`): squared-L2 distance `Σ(x−c)²` as
 * exact BIGINT per centroid, argmin ties to the SMALLEST centroid id —
 * bit-identical to the `min_by(struct(cid), struct(dist, cid))` rule the
 * crossJoin formulation used, but as ONE narrow per-row expression: the
 * corpus never exchanges before the (cid, pos) histogram aggregate.
 *
 * The centroid matrix rides a single `ctx.addReferenceObj` flat array
 * (no per-centroid literals in the tree), so analysis and codegen stay
 * O(1) in C; the distance loop is (C × dim) tight long arithmetic.
 * Overflow headroom matches the operator contract: |x| ≤ 10⁶·max|v|, so
 * Σ(x−c)² fits BIGINT to ~10⁴ dimensions at unit-scale embeddings.
 *
 * A null input vector returns null (no defined assignment); a vector
 * whose length differs from `dim` or that carries a null element also
 * returns null — the caller drops null assignments rather than crediting
 * garbage to an arbitrary centroid.
 *
 * `ids`/`matrix` are Seqs (not Arrays) so case-class equality and plan
 * canonicalization stay structural.
 */
case class NearestCentroidE6(
    child: Expression,
    ids: Seq[Long],
    matrix: Seq[Long], // C × dim, row-major, e6-scaled
    dim: Int
) extends UnaryExpression {

  require(dim > 0, "dim must be positive")
  require(ids.nonEmpty, "empty centroid set")
  require(matrix.length == ids.length * dim,
    s"matrix length ${matrix.length} != ${ids.length} centroids × $dim dims")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid_e6"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid_e6 requires ARRAY<BIGINT>, got $t")
  }

  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val matArr: Array[Long] = matrix.toArray

  /** The assignment kernel: exact BIGINT squared-L2 per centroid, argmin
    * with ties to the smallest id. Returns null (boxed) for malformed
    * vectors — wrong length or a null element.
    */
  def assign(vec: ArrayData): java.lang.Long = {
    val n = vec.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    var bestDist = Long.MaxValue
    var bestId = Long.MaxValue
    var c = 0
    while (c < idArr.length) {
      var acc = 0L
      var j = 0
      val base = c * dim
      while (j < dim) {
        val d = vec.getLong(j) - matArr(base + j)
        acc += d * d
        j += 1
      }
      if (acc < bestDist || (acc == bestDist && idArr(c) < bestId)) {
        bestDist = acc
        bestId = idArr(c)
      }
      c += 1
    }
    java.lang.Long.valueOf(bestId)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val r = assign(input.asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroidE6", this,
      classOf[NearestCentroidE6].getName)
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("assigned")
    ev.copy(code =
      org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
        new StringContext(
          s"""
             |${childGen.code}
             |boolean ${ev.isNull} = true;
             |long ${ev.value} = -1L;
             |if (!${childGen.isNull}) {
             |  java.lang.Long $boxed = $ref.assign(${childGen.value});
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
