package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Exact inversion count of a BIGINT array — `#{(i, j) : i < j ∧ a[i] >
 * a[j]}`, strict, so equal elements never count — via one merge-sort
 * pass (O(k log k), zero allocation beyond two work buffers).
 *
 * This is the per-bucket kernel of the Kendall-τ discordant-pair
 * count in [[graft.operators.Profile.rankCorrelationByGroup]]: the
 * distributed plan splits each group's rank sequence into bounded
 * blocks, counts within-block inversions HERE, and folds cross-block
 * discordance through windowed merge rounds — no pair join anywhere
 * (the round-10 verdict's O(n²) scale-killer). Strictness matters:
 * the merge counts a right-element pair only when the left element is
 * strictly larger, which is exactly Kendall's discordance on the
 * tie-free rank permutations the caller feeds in.
 *
 * Null semantics: a null array or any null element nulls the count
 * (malformed input must never read as "zero inversions").
 */
case class ArrayInversions(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_array_inversions"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    ArrayInversions.count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.plans.ArrayInversions.count($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayInversions {

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val functionDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_array_inversions"),
    new ExpressionInfo(classOf[ArrayInversions].getName, "graft_array_inversions"),
    { children =>
      require(children.size == 1, "graft_array_inversions(arr) takes 1 argument")
      ArrayInversions(children.head)
    }
  )

  /** Strict inversions of `a` by bottom-up merge sort; null on any
    * null element. The count fits a Long far beyond any real block
    * (k²/2 at k = 10⁶ is 5·10¹¹).
    */
  def count(a: ArrayData): java.lang.Long = {
    if (a == null) return null
    val n = a.numElements()
    val src = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      src(i) = a.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(countLongs(src))
  }

  /** Mutates `src`. Bottom-up merge: at each merge, moving a right
    * element before `remaining-left` strictly-larger left elements
    * adds that many inversions.
    */
  def countLongs(src: Array[Long]): Long = {
    val n = src.length
    if (n < 2) return 0L
    val buf = new Array[Long](n)
    var inv = 0L
    var width = 1
    var from = src
    var to = buf
    while (width < n) {
      var lo = 0
      while (lo < n) {
        val mid = math.min(lo + width, n)
        val hi = math.min(lo + 2 * width, n)
        var l = lo; var r = mid; var o = lo
        while (l < mid && r < hi) {
          // strict: equal elements drain from the LEFT, counting nothing
          if (from(l) <= from(r)) { to(o) = from(l); l += 1 }
          else { to(o) = from(r); r += 1; inv += (mid - l) }
          o += 1
        }
        while (l < mid) { to(o) = from(l); l += 1; o += 1 }
        while (r < hi) { to(o) = from(r); r += 1; o += 1 }
        lo = hi
      }
      val t = from; from = to; to = t
      width *= 2
    }
    inv
  }
}
