package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * FNV-1a 64-bit over the UTF-8 bytes of a string (public FNV constants).
 *
 * Exists alongside xxhash64 for ONE reason: cross-engine
 * reproducibility. Spark's xxhash64 is not implementable in plain SQL on
 * other engines, so any operator whose DECISIONS depend on a hash
 * (deterministic sampling, hash-mod routing) could only be weakly
 * verified. FNV-1a is a two-op fold — XOR then wrapping multiply — that
 * any engine with 128-bit integers reproduces exactly (the DuckDB
 * oracles do, via HUGEINT mod 2^64; spec-pinned against the published
 * FNV test vectors). Wrapping Long multiplication IS arithmetic mod
 * 2^64, so the low bits agree across signed/unsigned representations —
 * decisions on `h % 2^k` are portable.
 */
case class FnvHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fnv64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_fnv64 requires STRING, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    FnvHash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.FnvHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FnvHash64 {

  val OffsetBasis: Long = 0xcbf29ce484222325L
  val Prime: Long = 0x100000001b3L

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_fnv64"),
    new ExpressionInfo(classOf[FnvHash64].getName, "graft_fnv64"),
    { children =>
      require(children.size == 1, "graft_fnv64(str) takes 1 argument")
      FnvHash64(children.head)
    }
  )

  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * Prime
      i += 1
    }
    h
  }
}
