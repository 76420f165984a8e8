package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/**
 * Sliding `window`-token fingerprints of a token array in ONE pass —
 * `array<struct<s: long, h: long>>` with one entry per window start.
 * Semantically the hash is equality-of-token-sequence: two windows get
 * the same `h` iff (modulo collisions) they carry the same tokens in
 * the same order, which is all [[graft.operators.Dedup.removeDuplicatedWindows]]
 * needs. The composed form (`transform(sequence(...), i ->
 * xxhash64(concat_ws(' ', slice(toks, i+1, w))))`) rebuilds and
 * re-hashes a w-token string per start — O(tokens × window) characters
 * per doc, and the HOF chain is interpreted. Here each token is
 * FNV-1a-hashed ONCE ([[FnvHash64.hash]]) and consecutive windows roll:
 * `H(s+1) = (H(s) − h(t_s)·B^{w−1})·B + h(t_{s+w})` in wrapping Long
 * arithmetic (exact mod-2⁶⁴), so the whole array is O(tokens) work.
 *
 * Hash family: degree-(w−1) polynomial in the odd base B = FNV prime
 * over 64-bit token hashes. Like the xxhash64 form this is an equality
 * FINGERPRINT, not a portable decision hash — oracles replay window
 * equality on the window STRINGS, never on `h` (see the
 * dup_window_removal oracle).
 *
 * Short inputs: fewer than `window` tokens form one whole-array window
 * at start 0 (exact short duplicates still register); an empty array
 * yields an empty result.
 */
case class TokenWindowHashes(child: Expression, window: Int)
    extends UnaryExpression {

  require(window > 0, "window must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("s", LongType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_token_window_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_token_window_hashes requires ARRAY<STRING>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenWindowHashes.roll(input.asInstanceOf[ArrayData], window)

  // The static helper must NOT be named `eval`: the case class inherits
  // Expression.eval, so Scala suppresses the companion's static
  // forwarder for that name and the generated Java resolves to the
  // instance method — Janino then fails the stage and Spark silently
  // interprets the WHOLE plan (observed in the round-9 verify logs).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenWindowHashes.roll($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenWindowHashes {

  /** Rolling base: the FNV prime (odd, so multiplication mod 2⁶⁴ is a
    * bijection — no entropy loss as the window slides).
    */
  val Base: Long = FnvHash64.Prime

  def roll(arr: ArrayData, w: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      // null tokens cannot occur (tokens() never emits them); hash a
      // null element as 0 rather than NPE if a caller hands raw data
      val u = arr.getUTF8String(i)
      hs(i) = if (u == null) 0L else FnvHash64.hash(u)
      i += 1
    }
    if (n <= w) {
      var h = 0L
      var j = 0
      while (j < n) { h = h * Base + hs(j); j += 1 }
      return new GenericArrayData(
        Array[Any](new GenericInternalRow(Array[Any](0L, h))))
    }
    // B^(w-1) once, then roll
    var bw = 1L
    var k = 0
    while (k < w - 1) { bw *= Base; k += 1 }
    val out = new Array[Any](n - w + 1)
    var h = 0L
    var j = 0
    while (j < w) { h = h * Base + hs(j); j += 1 }
    out(0) = new GenericInternalRow(Array[Any](0L, h))
    var s = 1
    while (s <= n - w) {
      h = (h - hs(s - 1) * bw) * Base + hs(s + w - 1)
      out(s) = new GenericInternalRow(Array[Any](s.toLong, h))
      s += 1
    }
    new GenericArrayData(out)
  }
}
