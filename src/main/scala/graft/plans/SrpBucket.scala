package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Sign-random-projection bucket id over an embedding column — the LSH
 * primitive for cosine space. Bit p of the result is set iff the vector's
 * projection onto pseudo-random hyperplane p is ≥ 0; hyperplane
 * components are ±1 signs derived from xxhash64(i, p, seed).
 *
 * Bitwise-identical to the composed `aggregate(zip_with(vec,
 * sequence(...), ...))` fold (same left-to-right ±x accumulation, same
 * xxhash64 chain), which is interpreted AND re-hashes (i, p, seed) per
 * ROW. The signs depend only on (dim, bits, seed) — not on the data — so
 * this expression computes the ±1 matrix ONCE per (task × dim) and the
 * per-row work drops to bits × dim pure double adds. Null-element
 * semantics mirror the composed form: one null element nulls every
 * plane's fold, whose `when(proj >= 0, bit)` then contributes 0 — so the
 * bucket is 0. One deliberate divergence: a NULL vector yields null here
 * (the composed form's three-valued logic "buckets" it at 0 — a null
 * vector has no meaningful bucket).
 */
case class SrpBucket(child: Expression, bits: Int, seed: Int) extends UnaryExpression {

  require(bits > 0 && bits <= 63, s"bits must be in [1, 63], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_srp_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_bucket requires ARRAY<FLOAT|DOUBLE>, got $t")
  }

  // per-dimensionality sign matrix cache (bits × dim, row-major; true = +x).
  // ConcurrentHashMap: one expression instance is shared across a task's
  // rows, and embedding columns are fixed-dim in practice, so this holds
  // exactly one entry and the lookup is a hit after the first row.
  @transient private lazy val signCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Boolean]]()

  private def signs(dim: Int): Array[Boolean] =
    signCache.computeIfAbsent(dim, { d =>
      val out = new Array[Boolean](bits * d)
      var p = 0
      while (p < bits) {
        var i = 0
        while (i < d) {
          // mirrors xxhash64(i, p, seed): int children chain with seed 42
          import org.apache.spark.sql.catalyst.expressions.XXH64
          var h = XXH64.hashInt(i, 42L)
          h = XXH64.hashInt(p, h)
          h = XXH64.hashInt(seed, h)
          out(p * d + i) = (h & 1L) == 0L
          i += 1
        }
        p += 1
      }
      out
    })

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def bucket(vec: ArrayData): Long = {
    val fl = isFloat
    val n = vec.numElements()
    // composed parity: an EMPTY vector null-pads the zip (sequence(0,-1)
    // is non-empty), so every plane's fold is null → bucket 0
    if (n == 0) return 0L
    // a null element nulls every plane's fold → bucket 0 (composed parity)
    var i = 0
    while (i < n) { if (vec.isNullAt(i)) return 0L; i += 1 }
    val sg = signs(n)
    var out = 0L
    var p = 0
    while (p < bits) {
      var acc = 0.0
      val base = p * n
      var j = 0
      while (j < n) {
        val x = if (fl) vec.getFloat(j).toDouble else vec.getDouble(j)
        acc = acc + (if (sg(base + j)) x else -x)
        j += 1
      }
      if (acc >= 0) out |= (1L << p)
      p += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    bucket(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpBucket", this, classOf[SrpBucket].getName)
    defineCodeGen(ctx, ev, c => s"$ref.bucket($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBucket {

  import org.apache.spark.sql.catalyst.expressions.Literal

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_srp_bucket"),
    new ExpressionInfo(classOf[SrpBucket].getName, "graft_srp_bucket"),
    { children =>
      require(children.size == 3, "graft_srp_bucket(vec, bits, seed) takes 3 arguments")
      (children(1), children(2)) match {
        case (Literal(b: Int, _), Literal(s: Int, _)) => SrpBucket(children.head, b, s)
        case other => throw new IllegalArgumentException(
          s"graft_srp_bucket: bits and seed must be literal integers, got $other")
      }
    }
  )
}
