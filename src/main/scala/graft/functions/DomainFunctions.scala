package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Domain-level curation columns — the C4/RefinedWeb per-domain steps:
 * registered-domain extraction (public-suffix rules), blocklist
 * filtering, and the per-domain quota composition with
 * [[graft.operators.Sampling.quotaPerGroup]].
 */
object DomainFunctions {

  /** Lowercased URL host (scheme optional; see graft.plans.UrlParse for
    * the exact documented rule). Null for null/hostless input.
    */
  def urlHost(url: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.UrlHost(ColumnBridge.expression(url)))
  }

  /** Registered domain (`<label>.<public suffix>`) under a plain
    * suffix-rule list — most-labels rule wins, unmatched hosts fall
    * back to the last-label default, suffix-only hosts → null.
    */
  def registeredDomain(url: Column, rules: Seq[String]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.plans.RegisteredDomain(ColumnBridge.expression(url), rules))
  }

  /** Canonical URL for URL-level dedup (the C4 dedup key): lowercased
    * host + path, scheme/userinfo/port/query/fragment dropped,
    * trailing slashes stripped; null for hostless input.
    */
  def canonicalUrl(url: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.CanonicalUrl(ColumnBridge.expression(url)))
  }

  /** URL-level exact dedup: keep one row per canonical URL — the
    * smallest `keyCol` wins (deterministic). Rows with no canonical
    * form (hostless) are KEPT (they cannot collide on a URL they don't
    * have). Output adds `canonical_url`. One hash-aggregate shuffle on
    * the canonical key; the winner set semi-joins back, so full rows
    * never shuffle.
    */
  def dedupByUrl(df: DataFrame, urlCol: String, keyCol: String): DataFrame = {
    val withC = df.withColumn("canonical_url", canonicalUrl(col(urlCol)))
    val winners = withC.filter(col("canonical_url").isNotNull)
      .groupBy("canonical_url").agg(min(col(keyCol)).as(keyCol))
    withC.filter(col("canonical_url").isNull)
      .unionByName(withC.join(winners, Seq("canonical_url", keyCol), "left_semi"))
  }

  /** Drop rows whose registered domain is on the blocklist OR has no
    * registered domain at all (conservative: unparseable/suffix-only
    * hosts are not attributable, and a blocklist pipeline should not
    * pass what it cannot attribute). The blocklist is policy metadata —
    * broadcast by size.
    */
  def dropBlockedDomains(
      df: DataFrame,
      urlCol: String,
      rules: Seq[String],
      blocklist: Seq[String]
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val block = blocklist.map(_.toLowerCase(java.util.Locale.ROOT))
      .toDF("_blocked_domain")
    df.withColumn("_dom", registeredDomain(col(urlCol), rules))
      .filter(col("_dom").isNotNull)
      .join(broadcast(block), col("_dom") === col("_blocked_domain"),
        "left_anti")
      .withColumnRenamed("_dom", "domain")
  }

  /** Corpus composition by registered domain — the "what's in the
    * crawl" report every curation run starts from: `(domain, n_docs,
    * n_tokens, share_ppm)`, ordered by token mass (desc, then domain).
    * Unattributable rows (no registered domain) group under the
    * `"(none)"` sentinel so row ordering never depends on an engine's
    * null-placement default. `share_ppm` is the exact parts-per-million
    * token share under the library-wide HALF_UP integer rounding
    * kernel: `(2·n_tokens·10⁶ + total) div (2·total)` — BIGINT-safe to
    * ~9.2×10¹² total tokens, far past any single report's range.
    *
    * Scale shape: one map-side-combined aggregation to the per-domain
    * histogram (domains, not docs, cross the wire); the grand total
    * rides a window over the HISTOGRAM rows only (the bounded-rows
    * justification of the drift operators — never a second corpus
    * pass, never a crossJoin duplicating lineage).
    */
  def domainComposition(
      df: DataFrame,
      urlCol: String,
      tokenCountCol: Column,
      rules: Seq[String]
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = df
      .select(
        coalesce(registeredDomain(col(urlCol), rules), lit("(none)"))
          .as("domain"),
        tokenCountCol.cast("long").as("_nt"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum(col("_nt")).as("n_tokens"))
    per
      .withColumn("_tot",
        sum(col("n_tokens")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      .withColumn("share_ppm",
        expr("CAST((n_tokens * 2000000 + _tot) div (2 * _tot) AS BIGINT)"))
      .drop("_tot")
      .orderBy(col("n_tokens").desc, col("domain"))
  }
}
