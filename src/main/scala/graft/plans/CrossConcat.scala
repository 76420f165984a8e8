package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Cross-product concatenation of N string arrays — the MergedBinner
 * combiner (DataBinningProcessor.java:198-214): result element =
 * `prefix + a₁ + sep + a₂ + sep + ... + aₙ` for every combination, in
 * row-major order (first array slowest), matching the composed
 * `flatten(transform(acc, a => transform(next, b => concat(a, sep, b))))`
 * reduce. That composed form is an interpreted HOF chain evaluated per
 * row per element; this is one codegen'd pass building each output string
 * directly from the input UTF-8 bytes.
 *
 * Null semantics mirror the composed form: a null INPUT array nulls the
 * result; a null ELEMENT nulls the combinations it participates in
 * (`concat` of a null). Any empty input array yields an empty result.
 * Column-API only (prefix/sep are constructor arguments) — no
 * FunctionRegistry descriptor.
 */
case class CrossConcat(prefix: String, sep: String, children: Seq[Expression])
    extends Expression {

  require(children.nonEmpty, "CrossConcat requires at least one input array")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "graft_cross_concat"

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.map(_.dataType).filterNot {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cross_concat requires ARRAY<STRING> inputs, got ${bad.mkString(", ")}")
  }

  @transient private lazy val prefixU8 = UTF8String.fromString(prefix)
  @transient private lazy val sepU8 = UTF8String.fromString(sep)

  def cross(arrs: Array[ArrayData]): GenericArrayData = {
    var total = 1L
    var k = 0
    while (k < arrs.length) {
      total *= arrs(k).numElements()
      // fail loudly instead of truncating: a cross product this size is a
      // config error (bin arrays are levels × binners, i.e. tiny)
      if (total > Int.MaxValue) throw new IllegalArgumentException(
        s"graft_cross_concat: cross product exceeds ${Int.MaxValue} elements")
      k += 1
    }
    if (total == 0) return new GenericArrayData(Array.empty[Any])
    val n = total.toInt
    val out = new Array[Any](n)
    val idx = new Array[Int](arrs.length)
    var r = 0
    while (r < n) {
      // assemble prefix + e0 + sep + e1 + ... ; any null element → null.
      // layout: parts(0)=prefix, e_j at 2j+1, sep before e_j (j≥1) at 2j
      var nullHit = false
      val parts = new Array[UTF8String](2 * arrs.length)
      parts(0) = prefixU8
      var j = 0
      while (j < arrs.length && !nullHit) {
        if (arrs(j).isNullAt(idx(j))) nullHit = true
        else {
          if (j > 0) parts(2 * j) = sepU8
          parts(2 * j + 1) = arrs(j).getUTF8String(idx(j))
        }
        j += 1
      }
      out(r) = if (nullHit) null else UTF8String.concat(parts: _*)
      // odometer increment, last array fastest (row-major)
      var p = arrs.length - 1
      while (p >= 0) {
        idx(p) += 1
        if (idx(p) < arrs(p).numElements()) p = -1
        else { idx(p) = 0; p -= 1 }
      }
      r += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arrs = new Array[ArrayData](children.size)
    var i = 0
    while (i < arrs.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      arrs(i) = v.asInstanceOf[ArrayData]
      i += 1
    }
    cross(arrs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("crossConcat", this, classOf[CrossConcat].getName)
    val arrsTerm = ctx.freshName("arrs")
    val childCodes = children.map(_.genCode(ctx))
    // evaluate children in order; stop filling once a null child is seen
    val fill = childCodes.zipWithIndex.map { case (c, i) =>
      s"""
         |if (!${ev.isNull}) {
         |  ${c.code}
         |  if (${c.isNull}) { ${ev.isNull} = true; }
         |  else { $arrsTerm[$i] = ${c.value}; }
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = false;
        org.apache.spark.sql.catalyst.util.ArrayData[] $arrsTerm =
          new org.apache.spark.sql.catalyst.util.ArrayData[${children.size}];
        $fill
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) { ${ev.value} = $ref.cross($arrsTerm); }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
