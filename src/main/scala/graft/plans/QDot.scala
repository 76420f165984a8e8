package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/**
 * Exact dot product of two [[Quantize8]]-coded vectors WITHOUT
 * dequantizing: with codes qa/qb, offsets oa/ob, scales sa/sb and
 * dimension n,
 *
 *   Σ (oa + qa_i·sa)(ob + qb_i·sb)
 *     = sa·sb·Σqa_i·qb_i + sa·ob·Σqa_i + sb·oa·Σqb_i + n·oa·ob,
 *
 * so the per-pair loop is pure INTEGER multiply-adds over the 8-bit
 * codes (the three sums are exact longs: ≤ 255²·n) followed by four
 * double terms in a fixed written order — deterministic and
 * reproducible by any engine, hence oracle-gateable. This is the ANN
 * candidate-scan kernel for a quantized corpus: a quarter of the memory
 * traffic of float32 (the bandwidth-bound resource at 100 TB), with the
 * float vectors kept only for re-ranking the short top-k list.
 *
 * Null semantics: null if either struct is null, the dimensions differ,
 * either offset is null (empty/all-null source vector), or any code is
 * null (the source had null elements — a malformed vector scores null,
 * it does not silently skip terms).
 */
case class QDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_qdot"

  // structural match, nullability-insensitive: a quantize8 struct read
  // back from parquet resurfaces with every field nullable
  private def isQuantStruct(t: DataType): Boolean = t match {
    case StructType(Array(
        StructField("q", ArrayType(IntegerType, _), _, _),
        StructField("offset", DoubleType, _, _),
        StructField("scale", DoubleType, _, _))) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isQuantStruct(left.dataType) && isQuantStruct(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_qdot requires two graft_quantize8 structs, got " +
        s"${left.dataType} and ${right.dataType}")

  def qdot(a: InternalRow, b: InternalRow): java.lang.Double = {
    if (a.isNullAt(0) || b.isNullAt(0) || a.isNullAt(2) || b.isNullAt(2)) return null
    val qa = a.getArray(0)
    val qb = b.getArray(0)
    val n = qa.numElements()
    if (n != qb.numElements() || a.isNullAt(1) || b.isNullAt(1)) return null
    val oa = a.getDouble(1); val sa = a.getDouble(2)
    val ob = b.getDouble(1); val sb = b.getDouble(2)
    var sqq = 0L; var sqa = 0L; var sqb = 0L
    var i = 0
    while (i < n) {
      if (qa.isNullAt(i) || qb.isNullAt(i)) return null
      val x = qa.getInt(i).toLong
      val y = qb.getInt(i).toLong
      sqq += x * y; sqa += x; sqb += y
      i += 1
    }
    // fixed term order — mirror this expression verbatim in oracle SQL
    java.lang.Double.valueOf(
      sa * sb * sqq + sa * ob * sqa + sb * oa * sqb + n * oa * ob)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = qdot(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qdot", this, classOf[QDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = $ref.qdot($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QDot {

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_qdot"),
    new ExpressionInfo(classOf[QDot].getName, "graft_qdot"),
    { children =>
      require(children.size == 2, "graft_qdot(a, b) takes 2 arguments")
      QDot(children(0), children(1))
    }
  )
}
