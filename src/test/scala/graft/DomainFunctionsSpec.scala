package graft

import org.apache.spark.sql.functions._
import graft.functions.DomainFunctions

class DomainFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq("com", "org", "co.uk", "uk", "io", "github.io")

  private def hostOf(url: String): Option[String] = {
    val r = Seq(Tuple1(url)).toDF("u")
      .select(DomainFunctions.urlHost(col("u"))).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  private def domOf(url: String): Option[String] = {
    val r = Seq(Tuple1(url)).toDF("u")
      .select(DomainFunctions.registeredDomain(col("u"), rules)).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("urlHost: scheme/userinfo/port/path/fragment stripped, lowercased, trailing dot dropped") {
    assert(hostOf("https://www.Example.COM/page/1") == Some("www.example.com"))
    assert(hostOf("http://blog.site.co.uk/x?q=1") == Some("blog.site.co.uk"))
    assert(hostOf("https://user:pw@site.org:8443/x#frag") == Some("site.org"))
    assert(hostOf("site.github.io/repo") == Some("site.github.io"))   // schemeless
    assert(hostOf("https://a.b.c.com.") == Some("a.b.c.com"))         // trailing dot
    assert(hostOf("http://localhost:8080/health") == Some("localhost"))
    assert(hostOf("ftp+x-1://h.io") == Some("h.io"))                  // exotic scheme chars
    assert(hostOf("https://") == None)                                // hostless
    assert(hostOf("") == None)
  }

  test("registeredDomain: most-labels rule wins; default last-label; suffix-only null") {
    assert(domOf("https://www.site.com/x") == Some("site.com"))
    assert(domOf("http://blog.site.co.uk/") == Some("site.co.uk"))  // co.uk beats uk
    assert(domOf("site.github.io/repo") == Some("site.github.io")) // github.io beats io
    assert(domOf("https://a.b.site.com.") == Some("site.com"))     // deep subdomain
    assert(domOf("http://localhost/") == None)                     // 1 label, no rule
    assert(domOf("https://weird.host/") == Some("weird.host"))     // implicit * default
    assert(domOf("https://github.io/") == None)                    // host IS a suffix
    assert(domOf("https://com/") == None)
  }

  test("wildcard/exception rules and empty rule lists are rejected") {
    intercept[IllegalArgumentException] { domOf("x") // force construction below
      Seq(Tuple1("x")).toDF("u")
        .select(DomainFunctions.registeredDomain(col("u"), Seq("*.ck"))).collect()
    }
    intercept[IllegalArgumentException] {
      Seq(Tuple1("x")).toDF("u")
        .select(DomainFunctions.registeredDomain(col("u"), Seq.empty)).collect()
    }
  }

  test("canonicalUrl: spelling variants collapse; path case preserved; hostless null") {
    def canon(u: String): Option[String] = {
      val r = Seq(Tuple1(u)).toDF("u")
        .select(DomainFunctions.canonicalUrl(col("u"))).collect()(0)
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }
    assert(canon("https://ex.com/p/7") == Some("ex.com/p/7"))
    assert(canon("http://EX.COM/p/7/") == Some("ex.com/p/7"))
    assert(canon("ex.com:8080/p/7?utm=x#f") == Some("ex.com/p/7"))
    assert(canon("https://user@ex.com./p/7//") == Some("ex.com/p/7"))
    assert(canon("https://ex.com/P/Q") == Some("ex.com/P/Q")) // path case kept
    assert(canon("https://ex.com") == Some("ex.com"))         // empty path
    assert(canon("https://") == None)
  }

  test("dedupByUrl: min key wins per canonical; hostless rows survive") {
    val df = Seq(
      (3L, "https://ex.com/p"),
      (1L, "http://EX.com/p/"),
      (2L, "ex.com:80/p?x=1"),
      (7L, "https://other.com/q"),
      (9L, "https://")          // hostless: kept
    ).toDF("id", "url")
    val out = DomainFunctions.dedupByUrl(df, "url", "id")
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 7L, 9L))
  }

  test("dropBlockedDomains: blocked and unattributable rows drop; domain column lands") {
    val df = Seq(
      (1L, "https://www.good.com/a"),
      (2L, "https://bad.com/x"),
      (3L, "http://localhost/"),          // null domain -> dropped
      (4L, "https://sub.bad.com/y"),      // same registered domain -> dropped
      (5L, "https://other.org/z")
    ).toDF("id", "url")
    val kept = DomainFunctions.dropBlockedDomains(df, "url", rules, Seq("bad.com"))
      .select("id", "domain").as[(Long, String)].collect().toSet
    assert(kept == Set((1L, "good.com"), (5L, "other.org")))
    // the blocklist join broadcasts (policy metadata)
    val plan = DomainFunctions.dropBlockedDomains(df, "url", rules, Seq("bad.com"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan)
  }

  test("domainComposition: exact ppm shares, '(none)' sentinel, token-mass order") {
    val df = Seq(
      (1L, "https://a.good.com/x", 10L),
      (2L, "https://good.com/y", 30L),
      (3L, "https://other.org/z", 40L),
      (4L, "http://localhost/", 20L)      // unattributable
    ).toDF("id", "url", "nt")
    val out = DomainFunctions.domainComposition(df, "url", col("nt"), rules)
      .as[(String, Long, Long, Long)].collect().toSeq
    // good.com (2 docs, 40) ties other.org (1 doc, 40) → domain asc;
    // shares of total 100 in exact ppm, summing to 10⁶
    assert(out == Seq(
      ("good.com", 2L, 40L, 400000L),
      ("other.org", 1L, 40L, 400000L),
      ("(none)", 1L, 20L, 200000L)), out.toString)
    assert(out.map(_._4).sum == 1000000L)
  }
}
