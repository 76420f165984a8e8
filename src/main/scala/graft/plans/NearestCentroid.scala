package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Argmax centroid assignment with the centroid matrix embedded ONCE as a
 * flat object reference — the IVF building block at large C.
 *
 * The composed form (`array_max` over C `struct(cosine(vec, lit(cᵢ)),
 * -idᵢ)` branches) inlines C literal vectors into one expression tree:
 * fine at C in the tens, but at C in the thousands the tree size breaks
 * codegen (64 KB method / constant-pool limits) and analysis cost grows
 * O(C) per query. Here the matrix is ONE `Array[Double]` carried via
 * `ctx.addReferenceObj` — the generated code is a single call regardless
 * of C, and the similarity loop is (C × dim) tight double arithmetic.
 *
 * Bitwise-mirrors the composed arithmetic: per centroid,
 * `dot = Σ (double)vᵢ·cᵢ` left-to-right (see [[DotProduct]]),
 * `sim = nn > 0 ? dot/nn : 0` with `nn = sqrt(dot(v,v))·cnorm`, and the
 * argmax resolves ties to the SMALLEST centroid id with Spark's
 * nan-safe double ordering (NaN greatest, -0.0 == 0.0) — exactly the
 * lexicographic `array_max` of `(sim, -id)`. Equivalence is spec-pinned
 * against the composed form on real embeddings.
 *
 * One deliberate divergence: a null input vector returns null (the
 * composed form scores every centroid 0.0 via three-valued logic and
 * "assigns" the null vector to the smallest centroid id — garbage in,
 * arbitrary centroid out). Length-mismatched or null-element vectors
 * score 0.0 against every centroid and take the smallest id, exactly
 * like the composed form.
 *
 * `ids`/`matrix` are Seqs (not Arrays) so case-class equality and plan
 * canonicalization stay structural.
 */
case class NearestCentroid(
    child: Expression,
    ids: Seq[Long],
    matrix: Seq[Double], // C × dim, row-major
    dim: Int,
    useCosine: Boolean
) extends UnaryExpression {

  require(dim > 0, "dim must be positive")
  require(ids.nonEmpty, "empty centroid set")
  require(matrix.length == ids.length * dim,
    s"matrix length ${matrix.length} != ${ids.length} centroids × $dim dims")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid requires ARRAY<FLOAT|DOUBLE>, got $t")
  }

  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val matArr: Array[Double] = matrix.toArray
  // per-centroid norms, computed once per expression instance
  @transient private lazy val cnorms: Array[Double] = {
    val out = new Array[Double](idArr.length)
    var c = 0
    while (c < idArr.length) {
      var acc = 0.0
      var i = 0
      while (i < dim) { val x = matArr(c * dim + i); acc += x * x; i += 1 }
      out(c) = math.sqrt(acc)
      c += 1
    }
    out
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Spark's nan-safe double comparison: NaN == NaN and NaN is greatest;
    * -0.0 == 0.0 (primitive compare for the non-NaN case).
    */
  private def nanSafeCmp(x: Double, y: Double): Int =
    if (x < y) -1
    else if (x > y) 1
    else if (x == y) 0
    else { // at least one NaN
      val xn = java.lang.Double.isNaN(x)
      val yn = java.lang.Double.isNaN(y)
      if (xn && yn) 0 else if (xn) 1 else -1
    }

  /** The assignment kernel: mirrors cosine(vec, cᵢ) per centroid and the
    * lexicographic (sim, -id) argmax. Malformed vectors (wrong length /
    * null element) score 0.0 everywhere, as the composed form's
    * null-poisoned fold does via `otherwise(0.0)`.
    */
  def assign(vec: ArrayData): Long = {
    val fl = isFloat
    val n = vec.numElements()
    var malformed = n != dim
    var vnorm = 0.0
    if (!malformed) {
      var acc = 0.0
      var i = 0
      while (i < n && !malformed) {
        if (vec.isNullAt(i)) malformed = true
        else { val x = if (fl) vec.getFloat(i).toDouble else vec.getDouble(i); acc += x * x }
        i += 1
      }
      vnorm = math.sqrt(acc)
    }
    var bestSim = Double.NegativeInfinity
    var bestId = Long.MaxValue
    var c = 0
    while (c < idArr.length) {
      val sim =
        if (malformed) 0.0
        else {
          var acc = 0.0
          var i = 0
          val base = c * dim
          while (i < dim) {
            val x = if (fl) vec.getFloat(i).toDouble else vec.getDouble(i)
            acc = acc + x * matArr(base + i)
            i += 1
          }
          if (useCosine) {
            val nn = vnorm * cnorms(c)
            if (nn > 0.0) acc / nn else 0.0
          } else acc
        }
      val cmp = if (c == 0) 1 else nanSafeCmp(sim, bestSim)
      if (cmp > 0 || (cmp == 0 && idArr(c) < bestId)) {
        bestSim = sim
        bestId = idArr(c)
      }
      c += 1
    }
    bestId
  }

  override protected def nullSafeEval(input: Any): Any =
    assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this, classOf[NearestCentroid].getName)
    defineCodeGen(ctx, ev, c => s"$ref.assign($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
