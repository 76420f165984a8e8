package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * URL host extraction + public-suffix registered-domain resolution —
 * the C4/RefinedWeb curation primitive the text family needs for
 * per-domain filtering, blocklists, and per-host quotas. Two scalar
 * expressions sharing one parse:
 *
 *  - [[UrlHost]]: the lowercased host of a URL (scheme optional):
 *    strip `scheme://` (scheme = `[A-Za-z][A-Za-z0-9+.-]*`), cut the
 *    authority at the first of `/ ? #`, drop userinfo (through the
 *    LAST `@` in the authority — greedy, matching the oracle regex
 *    `[^/?#]*@`), drop `:port` (first `:` after userinfo), lowercase,
 *    strip one trailing dot. Empty host → null. (IPv6 bracket hosts
 *    and percent-encoded authorities are out of scope — documented;
 *    web-crawl URL corpora are overwhelmingly reg-name hosts.)
 *
 *  - [[RegisteredDomain]]: host reduced to `<label>.<public suffix>`
 *    under a PLAN-TIME suffix rule list (the public-suffix-list
 *    matching rule, restricted to plain rules: the rule matching the
 *    MOST labels wins; wildcard `*.` and exception `!` rules are not
 *    supported — the gate/oracle subset). A host not matching any rule
 *    falls back to the implicit `*` rule (suffix = its last label,
 *    PSL's documented default); a host that IS a suffix (or has no
 *    extra label) → null.
 *
 * Both are deterministic string work — an external engine reproduces
 * them with one regex + list slicing (see the `domain_extract` oracle).
 * Scale shape: narrow codegen'd scalar projections; the rule list is
 * fixed at plan time and indexed once per executor (suffix string →
 * hit, probed from the longest label count down), so per-row cost is a
 * few hash lookups regardless of rule-list size (the real PSL is ~9k
 * rules).
 */
object UrlParse {

  /** `url` with a leading `[A-Za-z][A-Za-z0-9+.-]*://` scheme stripped
    * (ASCII classes only — oracle-regex parity), else unchanged.
    */
  def afterScheme(url: String): String = {
    val n = url.length
    if (n > 0 && isAlpha(url.charAt(0))) {
      var i = 1
      while (i < n && isSchemeChar(url.charAt(i))) i += 1
      if (i + 2 < n && url.charAt(i) == ':' && url.charAt(i + 1) == '/' &&
          url.charAt(i + 2) == '/')
        return url.substring(i + 3)
    }
    url
  }

  /** Lowercased host per the documented rule, or null. */
  def host(url: String): String = {
    val s = afterScheme(url)
    // authority ends at the first of / ? #
    var end = 0
    val m = s.length
    while (end < m && s.charAt(end) != '/' && s.charAt(end) != '?' &&
      s.charAt(end) != '#') end += 1
    var auth = s.substring(0, end)
    // userinfo: through the LAST '@' (greedy, oracle-regex parity)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    // port: cut at the first ':'
    val colon = auth.indexOf(':')
    if (colon >= 0) auth = auth.substring(0, colon)
    var h = auth.toLowerCase(java.util.Locale.ROOT)
    if (h.endsWith(".")) h = h.substring(0, h.length - 1)
    if (h.isEmpty) null else h
  }

  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  @inline private def isSchemeChar(c: Char): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'
}

case class UrlHost(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_url_host"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_url_host requires a STRING argument, got ${child.dataType}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val h = UrlParse.host(input.asInstanceOf[UTF8String].toString)
    if (h == null) null else UTF8String.fromString(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""String graftHost = graft.plans.UrlParse.host($c.toString());
         |if (graftHost == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(graftHost); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlHost {
  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_url_host"),
    new ExpressionInfo(classOf[UrlHost].getName, "graft_url_host"),
    { children =>
      require(children.size == 1, "graft_url_host(url) takes 1 argument")
      UrlHost(children.head)
    }
  )
}

/**
 * Canonical URL for URL-level deduplication (the C4 dedup key): `host`
 * per [[UrlParse.host]] (lowercased, trailing dot stripped) joined with
 * the PATH with scheme/userinfo/port/query/fragment dropped and
 * trailing slashes stripped — so `https://A.com/x/`,
 * `http://a.com/x?utm=1` and `a.com/x#frag` all canonicalize to
 * `a.com/x`. Path case is preserved (paths are case-sensitive on most
 * servers; hosts are not). Null/hostless input → null.
 */
case class CanonicalUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_canonical_url"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_canonical_url requires a STRING argument, got ${child.dataType}")

  override def nullable: Boolean = true

  def canonical(url: String): String = {
    val h = UrlParse.host(url)
    if (h == null) return null
    // path: after the authority, up to the first of ? #
    val s = UrlParse.afterScheme(url)
    var a = 0
    val m = s.length
    while (a < m && s.charAt(a) != '/' && s.charAt(a) != '?' &&
      s.charAt(a) != '#') a += 1
    var end = a
    while (end < m && s.charAt(end) != '?' && s.charAt(end) != '#') end += 1
    var path = s.substring(a, end)
    while (path.endsWith("/")) path = path.substring(0, path.length - 1)
    h + path
  }

  override protected def nullSafeEval(input: Any): Any = {
    val c = canonical(input.asInstanceOf[UTF8String].toString)
    if (c == null) null else UTF8String.fromString(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("canonicalUrl", this, classOf[CanonicalUrl].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""String graftCanon = $ref.canonical($c.toString());
         |if (graftCanon == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(graftCanon); }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CanonicalUrl {
  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_canonical_url"),
    new ExpressionInfo(classOf[CanonicalUrl].getName, "graft_canonical_url"),
    { children =>
      require(children.size == 1, "graft_canonical_url(url) takes 1 argument")
      CanonicalUrl(children.head)
    }
  )
}

case class RegisteredDomain(child: Expression, rules: Seq[String])
    extends UnaryExpression {

  require(rules.nonEmpty, "graft_registered_domain: rule list must be non-empty")
  require(rules.forall(r => r.nonEmpty && !r.startsWith("*") && !r.startsWith("!")),
    "graft_registered_domain supports plain suffix rules only " +
      "(no wildcard/exception rules)")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_registered_domain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_registered_domain requires a STRING argument, got ${child.dataType}")

  override def nullable: Boolean = true

  // suffix set + the label counts present, probed longest-first —
  // built once per executor
  @transient private lazy val ruleSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    rules.foreach(r => s.add(r.toLowerCase(java.util.Locale.ROOT)))
    s
  }
  @transient private lazy val labelCounts: Array[Int] =
    rules.map(r => r.count(_ == '.') + 1).distinct.sorted.reverse.toArray

  def domain(url: String): String = {
    val h = UrlParse.host(url)
    if (h == null) return null
    // label start offsets (host = l0.l1...lk)
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < h.length) {
      if (h.charAt(i) == '.') starts += i + 1
      i += 1
    }
    val nLabels = starts.length
    // longest explicit rule match wins
    var li = 0
    while (li < labelCounts.length) {
      val k = labelCounts(li)
      if (k <= nLabels) {
        val suffix = h.substring(starts(nLabels - k))
        if (ruleSet.contains(suffix))
          return if (k == nLabels) null
            else h.substring(starts(nLabels - k - 1))
      }
      li += 1
    }
    // implicit '*' default: suffix = last label
    if (nLabels < 2) null else h.substring(starts(nLabels - 2))
  }

  override protected def nullSafeEval(input: Any): Any = {
    val d = domain(input.asInstanceOf[UTF8String].toString)
    if (d == null) null else UTF8String.fromString(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("registeredDomain", this,
      classOf[RegisteredDomain].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""String graftDom = $ref.domain($c.toString());
         |if (graftDom == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(graftDom); }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegisteredDomain {
  import org.apache.spark.sql.catalyst.expressions.Literal

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_registered_domain"),
    new ExpressionInfo(classOf[RegisteredDomain].getName, "graft_registered_domain"),
    { children =>
      require(children.size >= 2,
        "graft_registered_domain(url, rule1, rule2, ...) takes the url plus literal suffix rules")
      val rules = children.tail.map {
        case Literal(s: UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"graft_registered_domain: rules must be string literals, got $other")
      }
      RegisteredDomain(children.head, rules)
    }
  )
}
