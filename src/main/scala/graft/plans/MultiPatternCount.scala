package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Multi-pattern substring counting via an Aho–Corasick automaton built
 * at plan time — the blocklist/phrase-tagging kernel of a large-scale
 * filter stage. The naive form (`contains`/`replace` per pattern) is
 * O(patterns × text) per row: a production blocklist of 10k+ phrases
 * makes that 10,000 scans of every document. Aho–Corasick (1975; the
 * standard dictionary-matching automaton, what fgrep uses) walks each
 * document ONCE — O(text + matches) regardless of the pattern count —
 * which is the difference between a feasible and an infeasible filter
 * pass at 100 TB.
 *
 * Semantics (both modes count EVERY occurrence position, i.e. overlaps
 * and nested patterns all count — the automaton's natural output):
 *  - `distinctMode = false`: total number of (position, pattern)
 *    matches in the text.
 *  - `distinctMode = true`: number of DISTINCT patterns that occur at
 *    least once (the "how many blocklist rules fired" count).
 *
 * Matching is exact char-for-char (case-sensitive; callers lowercase
 * upstream when needed), so an external engine replays it with plain
 * substring arithmetic. Null text → null.
 *
 * Scale shape: a scalar projection (narrow, codegen'd via the
 * reference-object pattern of [[SubwordCount]]). The automaton builds
 * once per executor from the plan-shipped pattern list (transient
 * lazy); per-node match lists are pre-flattened through the fail
 * links at build time, so the hot loop never walks a fail chain for
 * output — only for transitions, which is the amortized-O(1) standard.
 */
case class MultiPatternCount(
    child: Expression,
    patterns: Seq[String],
    distinctMode: Boolean
) extends UnaryExpression {

  require(patterns.nonEmpty, "graft_multi_pattern: pattern list must be non-empty")
  require(patterns.forall(_.nonEmpty), "graft_multi_pattern: empty pattern")
  require(patterns.distinct.size == patterns.size,
    "graft_multi_pattern: duplicate pattern")

  override def dataType: DataType = LongType
  override def prettyName: String =
    if (distinctMode) "graft_multi_pattern_distinct" else "graft_multi_pattern_hits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType}")

  @transient private lazy val automaton = MultiPatternCount.build(patterns)

  def count(input: UTF8String): Long = {
    val s = input.toString
    val a = automaton
    var state = 0
    if (distinctMode) {
      val seen = new Array[Boolean](patterns.length)
      var i = 0
      while (i < s.length) {
        state = a.step(state, s.charAt(i))
        val ids = a.matchIds(state)
        var j = 0
        while (j < ids.length) { seen(ids(j)) = true; j += 1 }
        i += 1
      }
      var n = 0L
      var k = 0
      while (k < seen.length) { if (seen(k)) n += 1; k += 1 }
      n
    } else {
      var total = 0L
      var i = 0
      while (i < s.length) {
        state = a.step(state, s.charAt(i))
        total += a.matchIds(state).length
        i += 1
      }
      total
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multiPatternCount", this,
      classOf[MultiPatternCount].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiPatternCount {

  /** Built automaton: per-node char→next maps, fail links resolved into
    * the transition function, and per-node pre-flattened match-id lists
    * (own pattern ids ++ every id reachable over the fail chain).
    */
  private[plans] final class Automaton(
      gotoMaps: Array[mutable.HashMap[Char, Int]],
      fail: Array[Int],
      val matchIds: Array[Array[Int]]
  ) extends Serializable {
    /** One transition: follow fail links until a goto edge or root. */
    def step(state: Int, c: Char): Int = {
      var st = state
      while (st != 0 && !gotoMaps(st).contains(c)) st = fail(st)
      gotoMaps(st).getOrElse(c, 0)
    }
  }

  private[plans] def build(patterns: Seq[String]): Automaton = {
    val gotoMaps = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val own = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    // trie
    patterns.zipWithIndex.foreach { case (p, id) =>
      var st = 0
      p.foreach { c =>
        st = gotoMaps(st).getOrElseUpdate(c, {
          gotoMaps += mutable.HashMap.empty[Char, Int]
          own += mutable.ArrayBuffer.empty[Int]
          gotoMaps.length - 1
        })
      }
      own(st) += id
    }
    // BFS fail links + flattened match lists
    val n = gotoMaps.length
    val fail = new Array[Int](n)
    val matchIds = new Array[Array[Int]](n)
    matchIds(0) = own(0).toArray
    val queue = mutable.Queue.empty[Int]
    gotoMaps(0).valuesIterator.foreach { v =>
      fail(v) = 0
      matchIds(v) = own(v).toArray
      queue += v
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoMaps(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).contains(c)) f = fail(f)
        fail(v) = gotoMaps(f).get(c).filter(_ != v).getOrElse(0)
        matchIds(v) = (own(v) ++ matchIds(fail(v))).toArray
        queue += v
      }
    }
    new Automaton(gotoMaps.map(identity).toArray, fail, matchIds)
  }
}
