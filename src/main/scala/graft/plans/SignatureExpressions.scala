package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/**
 * Per-row signature primitives. The distributed dedup pipelines
 * (`minHashDupPairs` / `simHashDupPairs`) route through these: a
 * signature is a pure function of one document's shingles, so computing
 * it per row in one codegen'd pass is NARROW — zero shuffle, zero
 * aggregation state — strictly better at any scale than the earlier
 * explode + hash-aggregate shape (which still paid one shuffled row per
 * doc plus per-shingle agg-buffer updates). The composed-builtin
 * equivalents (k interpreted `array_min(transform(...))` lambdas, 64
 * `aggregate()` vote folds) re-walk the shingle array k times with no
 * codegen; equivalence is spec-pinned bit-for-bit.
 */

/** 64-bit SimHash from a shingle-hash array: bit i is set iff more
  * hashes have bit i set than clear — identical to the composed ±1 vote
  * fold in Dedup.simHashFromHashes, including its null behavior (a null
  * element votes −1 on every bit).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash64 requires ARRAY<BIGINT>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
    { children =>
      require(children.size == 1, "graft_simhash64(hashes) takes 1 argument")
      SimHash64(children.head)
    }
  )

  def sig(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val m = arr.numElements()
    var i = 0
    var n = 0
    while (i < m) {
      // null element = −1 vote on every bit (the composed fold's
      // when(...).otherwise(-1) with a null condition): counts toward n
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1
          b += 1
        }
      }
      n += 1
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      // vote sum = 2*set - n > 0
      if (2 * votes(b) > n) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** MinHash signature from a shingle STRING array: signature[i] =
  * min over shingles of xxhash64(shingle, seed = i) — identical to the
  * composed `array(array_min(transform(sh, s => xxhash64(s, i))) ...)`
  * chain but one pass over the shingles. Null elements are skipped;
  * an empty (or all-null) shingle set yields Long.MaxValue per slot,
  * matching array_min of an empty array being null→ the composed form
  * yields null; we mirror that by returning null.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_minhash_sig requires ARRAY<STRING>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value}_r =
        graft.plans.MinHashSig.sig($c, $numHashes);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  import org.apache.spark.sql.catalyst.expressions.Literal

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
    { children =>
      require(children.size == 2, "graft_minhash_sig(shingles, k) takes 2 arguments")
      val k = children(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_minhash_sig: k must be a literal integer, got $other")
      }
      MinHashSig(children.head, k)
    }
  )

  /** Spark's `xxhash64(str, intLit)` chains child hashes: the int literal
    * is hashed with the STRING's hash (seed 42) as ITS seed. Mirrored
    * exactly so signatures match the composed form bit-for-bit.
    */
  private def xxChain(strHash: Long, i: Int): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, strHash)

  private def strHash(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, 42L)

  def sig(arr: ArrayData, k: Int): GenericArrayData = {
    val m = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < m) {
      if (!arr.isNullAt(i)) {
        any = true
        val h0 = strHash(arr.getUTF8String(i))
        var j = 0
        while (j < k) {
          val h = xxChain(h0, j)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (!any) return null
    new GenericArrayData(mins.map(v => v: Any))
  }
}

/** Count of equal slots between two signature arrays — the MinHash
  * similarity estimate numerator, in one codegen'd pass. Equivalent to
  * `size(filter(zip_with(a, b, (x, y) => x === y), p => p))`, which is
  * interpreted (HOFs get no codegen): positions where either side is a
  * null element (or past the shorter array's end — zip_with's null
  * padding) yield a null comparison and are not counted.
  */
case class SigOverlap(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sig_overlap"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sig_overlap requires (ARRAY<BIGINT>, ARRAY<BIGINT>), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigOverlap.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.SigOverlap.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SigOverlap {

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sig_overlap"),
    new ExpressionInfo(classOf[SigOverlap].getName, "graft_sig_overlap"),
    { children =>
      require(children.size == 2, "graft_sig_overlap(a, b) takes 2 arguments")
      SigOverlap(children.head, children(1))
    }
  )

  def count(a: ArrayData, b: ArrayData): Int = {
    val m = math.min(a.numElements(), b.numElements())
    var n = 0
    var i = 0
    while (i < m) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) n += 1
      i += 1
    }
    n
  }
}

/** 64-bit SimHash straight from a shingle STRING array: hash + bit vote
  * in one pass, making the whole signature a narrow per-row column (the
  * explode → xxhash64 → collect_list shape shuffled ~8 bytes per shingle
  * per doc to reassemble what was already colocated). Bit-identical to
  * `SimHash64(transform(arr, s => xxhash64(s)))`: elements hash with
  * XXH64 seed 42; a null element mirrors `xxhash64(null)` = the seed
  * itself (42) and votes accordingly. An EMPTY array returns null so
  * callers drop shingle-less docs exactly as the explode form did (no
  * rows → no group).
  */
case class SimHashFromShingles(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_shingles requires ARRAY<STRING>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null else SimHashFromShingles.sig(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numElements() == 0) { ${ev.isNull} = true; }
      else { ${ev.value} = graft.plans.SimHashFromShingles.sig($c); }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFromShingles {

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash_shingles"),
    new ExpressionInfo(classOf[SimHashFromShingles].getName, "graft_simhash_shingles"),
    { children =>
      require(children.size == 1, "graft_simhash_shingles(shingles) takes 1 argument")
      SimHashFromShingles(children.head)
    }
  )

  def sig(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      // xxhash64(null) evaluates to the seed (42): Spark's hash expressions
      // skip null children, leaving the running hash at its seed value
      val h = if (arr.isNullAt(i)) 42L
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (2 * votes(b) > m) out |= (1L << b)
      b += 1
    }
    out
  }
}
