package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Top-`nprobe` nearest centroids over e6-scaled BIGINT vectors — the
 * multi-probe extension of [[NearestCentroidE6]]: exact BIGINT squared-L2
 * per centroid, the `nprobe` best returned as ARRAY<BIGINT> ordered by
 * (distance, id) ascending. Element 0 IS the argmin home assignment
 * (bit-identical to [[NearestCentroidE6]]'s tie-to-smallest-id rule), so
 * one narrow evaluation serves both sides of a multi-probe candidate
 * join: the index side keys on element 0, the query side explodes the
 * whole array. The corpus never exchanges to learn its probe set — the
 * window-over-(points × C) formulation this replaces shuffles n×C rows.
 *
 * Selection is insertion into an nprobe-slot (dist, id) ladder — C is a
 * committed-cell table (hundreds to low thousands) and nprobe is small,
 * so the kernel stays (C × dim + C × nprobe) tight long arithmetic. If
 * nprobe exceeds the centroid count the array holds all C cells.
 *
 * Null contract matches [[NearestCentroidE6]]: a null vector, a
 * wrong-length vector, or a null element returns null — the caller
 * drops null probe sets rather than crediting garbage cells.
 */
case class NearestCentroidsE6(
    child: Expression,
    ids: Seq[Long],
    matrix: Seq[Long], // C × dim, row-major, e6-scaled
    dim: Int,
    nprobe: Int
) extends UnaryExpression {

  require(dim > 0, "dim must be positive")
  require(nprobe > 0, "nprobe must be positive")
  require(ids.nonEmpty, "empty centroid set")
  require(matrix.length == ids.length * dim,
    s"matrix length ${matrix.length} != ${ids.length} centroids × $dim dims")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroids_e6"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroids_e6 requires ARRAY<BIGINT>, got $t")
  }

  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val matArr: Array[Long] = matrix.toArray

  /** The probe kernel: exact BIGINT squared-L2 per centroid, the nprobe
    * best by (distance, id) ascending. Returns null for malformed
    * vectors — wrong length or a null element.
    */
  def probes(vec: ArrayData): GenericArrayData = {
    val n = vec.numElements()
    if (n != dim) return null
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val m = math.min(nprobe, idArr.length)
    val bd = Array.fill(m)(Long.MaxValue)
    val bi = Array.fill(m)(Long.MaxValue)
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
      val id = idArr(c)
      // insertion position: strictly better than slot p by (dist, id)
      var p = m
      while (p > 0 && (acc < bd(p - 1) ||
          (acc == bd(p - 1) && id < bi(p - 1)))) p -= 1
      if (p < m) {
        var s = m - 1
        while (s > p) { bd(s) = bd(s - 1); bi(s) = bi(s - 1); s -= 1 }
        bd(p) = acc
        bi(p) = id
      }
      c += 1
    }
    new GenericArrayData(bi)
  }

  override protected def nullSafeEval(input: Any): Any =
    probes(input.asInstanceOf[ArrayData])

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroidsE6", this,
      classOf[NearestCentroidsE6].getName)
    val childGen = child.genCode(ctx)
    val arr = ctx.freshName("probeArr")
    ev.copy(code =
      org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
        new StringContext(
          s"""
             |${childGen.code}
             |boolean ${ev.isNull} = true;
             |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
             |if (!${childGen.isNull}) {
             |  org.apache.spark.sql.catalyst.util.GenericArrayData $arr =
             |    $ref.probes(${childGen.value});
             |  if ($arr != null) {
             |    ${ev.isNull} = false;
             |    ${ev.value} = $arr;
             |  }
             |}
             |""".stripMargin)).code())
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
