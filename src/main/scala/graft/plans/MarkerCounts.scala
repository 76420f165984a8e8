package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Marker-set hit counts over a token array in ONE walk: element i of the
 * result is the number of tokens contained in `sets(i)`. Replaces N
 * interpreted `size(filter(tokens, _.isin(markers)))` higher-order
 * lambdas (no codegen, no CSE — each one re-walks the token array) with
 * a single codegen'd pass over a precomputed token→set-membership bitmask
 * table. A token may belong to several sets (e.g. "la" is both an es and
 * fr marker) and then counts toward each.
 *
 * Used by language-ID (one count per language marker set) and the
 * stopword-ratio quality feature (a single stopword set) —
 * TextFunctions.langId / stopwordRatio. Column-API only (the set list is
 * a Scala-side constructor argument, not SQL-expressible), so there is no
 * FunctionRegistry descriptor.
 */
case class MarkerCounts(child: Expression, sets: Seq[Seq[String]]) extends UnaryExpression {

  require(sets.nonEmpty, "MarkerCounts requires at least one marker set")
  require(sets.size <= 30, s"MarkerCounts supports at most 30 sets, got ${sets.size}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_marker_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_marker_counts requires ARRAY<STRING>, got $t")
  }

  /** token → bitmask of the sets containing it; rebuilt lazily per
    * executor after serialization.
    */
  @transient private lazy val masks: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    sets.zipWithIndex.foreach { case (set, i) =>
      set.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  def count(arr: ArrayData): GenericArrayData = {
    val counts = new Array[Int](sets.size)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val mask = masks.get(arr.getUTF8String(i))
        if (mask != null) {
          var mm = mask.intValue()
          while (mm != 0) {
            counts(Integer.numberOfTrailingZeros(mm)) += 1
            mm &= mm - 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(counts.map(v => v: Any))
  }

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerCounts", this, classOf[MarkerCounts].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
