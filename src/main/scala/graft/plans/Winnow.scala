package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Winnowing document fingerprints (Schleimer, Wilkerson, Aiken — the
 * MOSS local fingerprinting algorithm): hash every character k-gram,
 * slide a window of `w` consecutive hashes, and select each window's
 * MINIMUM hash (rightmost occurrence on ties). The selected set is the
 * document's fingerprint sketch, with the paper's guarantee: any shared
 * substring of length ≥ w + k − 1 between two documents shares at least
 * one selected fingerprint — which makes it the right primitive for
 * PARTIAL-overlap detection (quotation, containment, boilerplate spans),
 * where whole-document MinHash/SimHash sketches wash out.
 *
 * Returns the DISTINCT selected hashes sorted ascending (set semantics —
 * positions are not kept; overlap detection joins on hash values).
 * Documents shorter than k characters have no k-grams and return an
 * empty array. Density is ~2/(w+1) fingerprints per character, so the
 * sketch is a bounded fraction of the text at any scale. Hashes are
 * FNV-1a 64 over the gram's UTF-8 bytes ([[FnvHash64]] — portable to
 * SQL oracles). Null text yields null.
 */
case class Winnow(child: Expression, k: Int, w: Int) extends UnaryExpression {

  require(k > 0, "k (gram size) must be positive")
  require(w > 0, "w (window size) must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_winnow requires STRING, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    Winnow.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Winnow.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Winnow {

  import org.apache.spark.sql.catalyst.expressions.Literal

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_winnow"),
    new ExpressionInfo(classOf[Winnow].getName, "graft_winnow"),
    { children =>
      require(children.size == 3, "graft_winnow(text, k, w) takes 3 arguments")
      (children(1), children(2)) match {
        case (Literal(k: Int, _), Literal(w: Int, _)) => Winnow(children.head, k, w)
        case other => throw new IllegalArgumentException(
          s"graft_winnow: k and w must be literal integers, got $other")
      }
    }
  )

  /** Selected fingerprints of `s`: distinct, sorted ascending. Works on
    * CHARACTERS (codepoints), hashing each gram's UTF-8 bytes — computed
    * directly over codepoint byte ranges of the underlying buffer, zero
    * per-gram allocation (a substring-per-gram draft allocated m strings
    * per document).
    */
  def fingerprints(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = s.getBytes
    // codepoint start offsets (UTF-8 is self-synchronizing: the first
    // byte of each codepoint determines its width)
    var cp = 0
    var off = 0
    val startsBuf = new Array[Int](s.numChars() + 1)
    while (off < bytes.length) {
      startsBuf(cp) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      cp += 1
    }
    startsBuf(cp) = bytes.length
    val m = cp - k + 1 // number of k-grams
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = FnvHash64.OffsetBasis
      var b = startsBuf(i)
      val end = startsBuf(i + k)
      while (b < end) {
        h = (h ^ (bytes(b) & 0xffL)) * FnvHash64.Prime
        b += 1
      }
      hs(i) = h
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    // fewer grams than the window = one window spanning them all
    val windows = math.max(1, m - w + 1)
    var prevPick = -1
    var wi = 0
    while (wi < windows) {
      val end = math.min(wi + w, m) // exclusive
      // rightmost minimum in [wi, end): <= keeps the later occurrence
      var best = wi
      var j = wi + 1
      while (j < end) {
        if (hs(j) <= hs(best)) best = j
        j += 1
      }
      if (best != prevPick) {
        selected.add(hs(best))
        prevPick = best
      }
      wi += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }
}
