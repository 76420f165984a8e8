package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Per-vector affine 8-bit quantization in ONE pass: struct(q ARRAY<INT>
 * in [0,255], offset DOUBLE, scale DOUBLE) with
 * `q_i = round((v_i − min) · 255 / (max − min))`, `offset = min`,
 * `scale = (max − min)/255`. Replaces the composed
 * transform/array_min/array_max chain (four interpreted HOF walks per
 * row — the map-stage cost when quantizing a 100 TB embedding store)
 * with one codegen'd two-scan eval and zero intermediate allocation.
 *
 * Semantics are bit-identical to the composed form (spec-pinned) and to
 * the oracle SQL: min/max ignore null elements; when max > min a null
 * element yields a null code; a constant (or all-null, or empty) vector
 * yields all-zero codes with scale 0 (and null offset when there are no
 * non-null elements). `Math.round` = half-up, matching both engines'
 * rounding on the always-nonnegative scaled values.
 */
case class Quantize8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Quantize8.OutType
  override def prettyName: String = "graft_quantize8"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_quantize8 requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got $t")
  }

  def quantize(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var mn = Double.MaxValue
    var mx = -Double.MaxValue
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        if (!seen || v < mn) mn = v
        if (!seen || v > mx) mx = v
        seen = true
      }
      i += 1
    }
    val codes = new Array[Any](n)
    if (seen && mx > mn) {
      val range = mx - mn
      i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          codes(i) = java.lang.Math.round((v - mn) * 255.0 / range).toInt
        } // else stays null — same as the composed transform over a null
        i += 1
      }
    } else {
      // constant / empty / all-null vector: every element (nulls
      // included — composed-form parity) codes to 0, scale 0
      i = 0
      while (i < n) { codes(i) = 0; i += 1 }
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(codes),
      if (seen) mn else null,
      if (seen && mx > mn) (mx - mn) / 255.0 else 0.0))
  }

  override protected def nullSafeEval(input: Any): Any =
    quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantize8", this, classOf[Quantize8].getName)
    defineCodeGen(ctx, ev, c => s"$ref.quantize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Quantize8 {

  val OutType: StructType = StructType(Seq(
    StructField("q", ArrayType(IntegerType, containsNull = true), nullable = false),
    StructField("offset", DoubleType, nullable = true),
    StructField("scale", DoubleType, nullable = false)))

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_quantize8"),
    new ExpressionInfo(classOf[Quantize8].getName, "graft_quantize8"),
    { children =>
      require(children.size == 1, "graft_quantize8(vec) takes 1 argument")
      Quantize8(children.head)
    }
  )
}
