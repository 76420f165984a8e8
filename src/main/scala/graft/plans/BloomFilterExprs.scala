package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType}

/**
 * Deterministic Bloom-filter kernels for semi-join reduction — the
 * 100 TB join pattern where the dim side is too big to broadcast as
 * ROWS but its key FINGERPRINT fits in memory: probe positions are
 * collected from the dim keys (bounded by the filter size `mBits`,
 * never by the dim row count), the bitset builds driver-side, and the
 * fact side filters BEFORE its shuffle, so rows that cannot join never
 * enter the exchange. False positives are removed by the exact join
 * that follows; false negatives are impossible by construction, so the
 * operator's RESULT is bit-identical to the plain join — the Bloom
 * stage is pure I/O avoidance, which is why its gate oracle is the
 * unadorned join SQL.
 *
 * Probe math (shared by both expressions so build and probe can never
 * diverge): SplitMix64 finalization (Steele et al. 2014, the public
 * java.util.SplittableRandom mixer) gives h1 and h2, then the standard
 * Kirsch–Mitzenmacher double hashing `pos_i = (h1 + i·h2) mod m`.
 */
object BloomProbe {

  /** SplitMix64 finalization mix. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The i-th probe position for a long key. */
  @inline def position(key: Long, i: Int, mBits: Int): Int = {
    val h1 = mix64(key)
    val h2 = mix64(key ^ 0x5851F42D4C957F2DL) | 1L // odd → full-period stride
    java.lang.Math.floorMod(h1 + i.toLong * h2, mBits.toLong).toInt
  }
}

/** `graft_bloom_positions(key) -> array<int>` — the k probe positions
  * of a long key, for BUILDING the filter: explode + distinct bounds
  * the collected set by `mBits` regardless of how many keys fed it.
  */
case class BloomProbePositions(child: Expression, mBits: Int, k: Int)
    extends UnaryExpression {

  require(mBits >= 64 && mBits <= (1 << 28),
    s"graft_bloom_positions: mBits must be in [64, 2^28], got $mBits")
  require(k >= 1 && k <= 16, s"graft_bloom_positions: k must be in [1, 16], got $k")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_bloom_positions"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_positions requires a BIGINT key, got ${child.dataType}")

  def positions(key: Long): GenericArrayData = {
    val out = new Array[Any](k)
    var i = 0
    while (i < k) { out(i) = BloomProbe.position(key, i, mBits); i += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    positions(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomPositions", this,
      classOf[BloomProbePositions].getName)
    defineCodeGen(ctx, ev, c => s"$ref.positions($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_bloom_might_contain(key) -> boolean` — probes a bitset built
  * from [[BloomProbePositions]] output with the identical probe math.
  * The bitset ships in the plan (the [[SubwordCount]] vocab
  * convention): mBits/8 bytes, the same cost class as a broadcast
  * literal — a fact-side filter this small is exactly what makes the
  * pre-shuffle reduction free.
  */
case class BloomMightContain(child: Expression, words: Array[Long], mBits: Int, k: Int)
    extends UnaryExpression {

  require(words.length == (mBits + 63) / 64,
    s"graft_bloom_might_contain: ${words.length} words for $mBits bits")
  require(k >= 1 && k <= 16, s"graft_bloom_might_contain: k must be in [1, 16], got $k")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain requires a BIGINT key, got ${child.dataType}")

  def mightContain(key: Long): Boolean = {
    var i = 0
    while (i < k) {
      val pos = BloomProbe.position(key, i, mBits)
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def nullSafeEval(input: Any): Any =
    mightContain(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomContain", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // Array[Long] is mutable, so the default case-class equality is
  // reference equality — make plan comparison structural
  override def equals(other: Any): Boolean = other match {
    case BloomMightContain(c, w, m, kk) =>
      c == child && m == mBits && kk == k && java.util.Arrays.equals(w, words)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.lang.Integer.valueOf(mBits),
      java.lang.Integer.valueOf(k), java.lang.Integer.valueOf(java.util.Arrays.hashCode(words)))
}
