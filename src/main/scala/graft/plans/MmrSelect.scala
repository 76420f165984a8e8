package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Greedy maximal-marginal-relevance selection (Carbonell & Goldstein,
 * SIGIR 1998) over ONE query's k-bounded candidate list — the
 * diversification step after a top-k retrieval: at each of `m` steps
 * pick `argmax_i λ·score_i − (1−λ)·max_{j∈selected} sim(i, j)`, the
 * candidate that is relevant AND unlike what's already chosen.
 *
 * Input: `array<struct<id: bigint, score: double,
 * vec: array<float|double>>>`, pre-sorted ascending by id (the caller
 * uses `sort_array(collect_list(...))`) so evaluation order — and
 * therefore tie-breaking (strict `>` keeps the SMALLEST id on equal
 * value) — is deterministic. Output: `array<struct<neighbor_id,
 * mmr>>` in selection order.
 *
 * This is a per-QUERY-row kernel, not a per-corpus-row one: the greedy
 * loop is inherently sequential in `m`, but each query's O(m·n·dim)
 * work (n ≤ k candidates) runs independently wherever its row lives —
 * the expensive corpus-wide part already happened in the top-k that
 * produced the candidates. `sim` is the same left-fold double dot
 * product as [[DotProduct]] (cosine optional, zero norms → sim 0);
 * the running `max_{j∈selected}` is maintained incrementally
 * (`best_i = max(best_i, sim(i, picked))` — floating max is exact, so
 * this equals the direct max over the selected set) and the empty-set
 * penalty is 0, making step 1 a pure λ·score argmax. Every arithmetic
 * step is fixed-order IEEE, so an external engine replays the exact
 * selection (the gate's DuckDB oracle unrolls the m steps as CTEs).
 *
 * Candidates with a null vector, or whose length differs from the
 * expected dimensionality, are EXCLUDED before selection (a vector
 * that can't enter the sim term can't be diversified against); the
 * expected dimensionality is the MODE of candidate vector lengths
 * (smallest wins ties) so one malformed candidate can never evict the
 * well-formed rest; a null candidate array returns null.
 */
case class MmrSelect(
    child: Expression,
    m: Int,
    lambda: Double,
    useCosine: Boolean
) extends UnaryExpression {

  require(m > 0, "m must be positive")
  require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")

  override def prettyName: String = "graft_mmr_select"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("mmr", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, DoubleType, _, _),
        StructField(_, ArrayType(FloatType | DoubleType, _), _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      "graft_mmr_select requires ARRAY<STRUCT<BIGINT, DOUBLE, ARRAY<FLOAT|DOUBLE>>>, " +
        s"got $t")
  }

  @transient private lazy val vecIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType].fields(2).dataType
      .asInstanceOf[ArrayType].elementType == FloatType

  /** The greedy kernel. */
  def select(candidates: ArrayData): ArrayData = {
    val fl = vecIsFloat
    val nIn = candidates.numElements()
    // expected dimensionality = the MODE of candidate vector lengths
    // (smallest length wins ties, deterministically) — taking the first
    // seen length let a single malformed-length first candidate
    // silently exclude every well-formed one
    val lens = new java.util.HashMap[Integer, Integer]()
    var c0 = 0
    while (c0 < nIn) {
      if (!candidates.isNullAt(c0)) {
        val row = candidates.getStruct(c0, 3)
        if (!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2))
          lens.merge(row.getArray(2).numElements(),
            1, (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      }
      c0 += 1
    }
    var dim = -1
    var dimCnt = 0
    val it = lens.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val (len, cnt) = (e.getKey.intValue(), e.getValue.intValue())
      if (cnt > dimCnt || (cnt == dimCnt && len < dim)) { dim = len; dimCnt = cnt }
    }
    // parse + drop null/malformed-vector candidates
    val ids = new Array[Long](nIn)
    val scores = new Array[Double](nIn)
    val vecs = new Array[Array[Double]](nIn)
    var n = 0
    var c = 0
    while (c < nIn) {
      if (!candidates.isNullAt(c)) {
        val row = candidates.getStruct(c, 3)
        if (!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2)) {
          val va = row.getArray(2)
          val len = va.numElements()
          if (len == dim && dim > 0) {
            var ok = true
            val v = new Array[Double](len)
            var i = 0
            while (i < len && ok) {
              if (va.isNullAt(i)) ok = false
              else v(i) = if (fl) va.getFloat(i).toDouble else va.getDouble(i)
              i += 1
            }
            if (ok) {
              ids(n) = row.getLong(0)
              scores(n) = row.getDouble(1)
              vecs(n) = v
              n += 1
            }
          }
        }
      }
      c += 1
    }
    val norms: Array[Double] =
      if (!useCosine) null
      else {
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          var acc = 0.0
          var d = 0
          while (d < dim) { val x = vecs(i)(d); acc += x * x; d += 1 }
          out(i) = math.sqrt(acc)
          i += 1
        }
        out
      }
    def sim(a: Int, b: Int): Double = {
      var acc = 0.0
      var d = 0
      while (d < dim) { acc = acc + vecs(a)(d) * vecs(b)(d); d += 1 }
      if (useCosine) {
        val nn = norms(a) * norms(b)
        if (nn > 0.0) acc / nn else 0.0
      } else acc
    }
    val oneMinus = 1.0 - lambda
    val best = new Array[Double](n) // max sim to the selected set; 0 when empty
    val taken = new Array[Boolean](n)
    val outN = math.min(m, n)
    val out = new Array[Any](outN)
    var t = 0
    while (t < outN) {
      var pick = -1
      var pickVal = 0.0
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          val v = lambda * scores(i) - oneMinus * best(i)
          // strict > keeps the smallest id on ties (ascending input)
          if (pick < 0 || v > pickVal) { pick = i; pickVal = v }
        }
        i += 1
      }
      taken(pick) = true
      out(t) = new GenericInternalRow(Array[Any](ids(pick), pickVal))
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val s = sim(j, pick)
          if (s > best(j)) best(j) = s
        }
        j += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    select(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mmrSelect", this, classOf[MmrSelect].getName)
    defineCodeGen(ctx, ev, c => s"$ref.select($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
