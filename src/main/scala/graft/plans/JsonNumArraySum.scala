package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass sum of a JSON numeric-array STRING — the hot primitive of
 * the typed projection's array-sum attributes
 * (BetterAttributesToJSON.java:295-335).
 *
 * The composed-builtin version (`from_json` + `aggregate`) pays a Jackson
 * parser per row plus an interpreted fold; this expression scans the
 * UTF-8 bytes once inside whole-stage codegen. Sum order is left-to-right
 * (same as the fold), so results are bit-identical.
 *
 * Null semantics mirror the reference more faithfully than `from_json`:
 * any malformed element nulls the WHOLE sum (the reference's
 * `(Integer) o` cast throws and routes the record to failure —
 * BetterAttributesToJSON.java:311-313,332-334); JSON `null` elements
 * contribute 0, matching the previous fold's `coalesce(x, 0)`.
 */
abstract class JsonNumArraySumBase extends UnaryExpression {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType}")
}

case class JsonDoubleArraySum(child: Expression) extends JsonNumArraySumBase {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_json_double_sum"

  override protected def nullSafeEval(input: Any): Any =
    JsonNumArraySum.sumDouble(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double ${ev.value}_r = graft.plans.JsonNumArraySum.sumDouble($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class JsonLongArraySum(child: Expression) extends JsonNumArraySumBase {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_json_long_sum"

  override protected def nullSafeEval(input: Any): Any =
    JsonNumArraySum.sumLong(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.plans.JsonNumArraySum.sumLong($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonNumArraySum {

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val doubleDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_json_double_sum"),
    new ExpressionInfo(classOf[JsonDoubleArraySum].getName, "graft_json_double_sum"),
    { children =>
      require(children.size == 1, "graft_json_double_sum(str) takes 1 argument")
      JsonDoubleArraySum(children.head)
    }
  )

  val longDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_json_long_sum"),
    new ExpressionInfo(classOf[JsonLongArraySum].getName, "graft_json_long_sum"),
    { children =>
      require(children.size == 1, "graft_json_long_sum(str) takes 1 argument")
      JsonLongArraySum(children.head)
    }
  )

  /** Imperative registration for an existing session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(doubleDescriptor, longDescriptor).foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  /** Strict JSON number grammar (RFC 8259 §6):
    * `-?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?`. Guards the
    * parseDouble/parseLong calls below, which are laxer than Jackson —
    * they accept "NaN", "Infinity", "1.5f", hex floats, leading '+',
    * ".5"/"1." — so e.g. "[Infinity]" must route to failure (null), not
    * sum to Infinity.
    */
  private def isJsonNumber(t: String): Boolean = {
    val n = t.length
    var i = 0
    if (n == 0) return false
    if (t.charAt(i) == '-') i += 1
    if (i >= n) return false
    val c = t.charAt(i)
    if (c == '0') i += 1
    else if (c >= '1' && c <= '9') {
      while (i < n && t.charAt(i) >= '0' && t.charAt(i) <= '9') i += 1
    } else return false
    if (i < n && t.charAt(i) == '.') {
      i += 1
      if (i >= n || t.charAt(i) < '0' || t.charAt(i) > '9') return false
      while (i < n && t.charAt(i) >= '0' && t.charAt(i) <= '9') i += 1
    }
    if (i < n && (t.charAt(i) == 'e' || t.charAt(i) == 'E')) {
      i += 1
      if (i < n && (t.charAt(i) == '+' || t.charAt(i) == '-')) i += 1
      if (i >= n || t.charAt(i) < '0' || t.charAt(i) > '9') return false
      while (i < n && t.charAt(i) >= '0' && t.charAt(i) <= '9') i += 1
    }
    i == n
  }

  /** null ⇒ malformed (whole-sum null); `[]` ⇒ 0. */
  def sumDouble(s: UTF8String): java.lang.Double = {
    val toks = tokens(s)
    if (toks == null) return null
    var sum = 0.0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t != "null") {
        if (!isJsonNumber(t)) return null
        try sum += java.lang.Double.parseDouble(t)
        catch { case _: NumberFormatException => return null }
      }
      i += 1
    }
    java.lang.Double.valueOf(sum)
  }

  def sumLong(s: UTF8String): java.lang.Long = {
    val toks = tokens(s)
    if (toks == null) return null
    var sum = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t != "null") {
        if (!isJsonNumber(t)) return null
        try sum += java.lang.Long.parseLong(t)
        catch { case _: NumberFormatException => return null }
      }
      i += 1
    }
    java.lang.Long.valueOf(sum)
  }

  /** Trimmed element tokens of a JSON array string; null if not `[...]`,
    * empty array for `[]`.
    */
  private def tokens(s: UTF8String): Array[String] = {
    if (s == null) return null
    val str = s.toString.trim
    if (str.length < 2 || str.charAt(0) != '[' || str.charAt(str.length - 1) != ']')
      return null
    val body = str.substring(1, str.length - 1).trim
    if (body.isEmpty) return Array.empty
    val out = body.split(",", -1)
    var i = 0
    while (i < out.length) { out(i) = out(i).trim; i += 1 }
    out
  }
}
