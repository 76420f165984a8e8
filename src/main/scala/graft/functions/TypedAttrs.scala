package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.TypedProjection

/**
 * Typed projection of a string attribute map into typed columns — the
 * Spark re-expression of the reference's attributes→typed-JSON processor
 * (BetterAttributesToJSON.java:194-335).
 *
 * Everything here is a pure `Column` expression: Catalyst folds constants,
 * prunes unused attrs, and whole-stage-codegens the casts, so at 100 TB this
 * is a narrow, shuffle-free map stage.
 *
 * Fidelity notes (SURVEY §7.5):
 *  - missing string → "" (BetterAttributesToJSON.java:216)
 *  - missing boolean → false (:235); any non-"true" text → false
 *    (Boolean.parseBoolean semantics, not SQL cast — "1"/"yes" are false)
 *  - missing/malformed int/double → null (:250,:265)
 *  - epoch millis → UTC instant, rendered as Mongo extended-JSON
 *    `yyyy-MM-dd'T'HH:mm:ss.SSS'Z'` (:59-60,271-293)
 *  - array-sum: attribute holds a JSON array string; parse + fold (:295-335).
 *    The reference's int-sum guard bug (:316 re-tests the double list) is
 *    NOT replicated — we honor the int list independently (evident intent).
 */
object TypedAttrs {

  /** ISO-8601 GMT-0 template, BetterAttributesToJSON.java:59-60. */
  val IsoMillisFormat = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

  /** Missing string → "" — NOT null. */
  def stringAttr(c: Column): Column = coalesce(c, lit(""))

  /** Java Boolean.parseBoolean: true iff equalsIgnoreCase("true");
    * missing → false.
    */
  def booleanAttr(c: Column): Column =
    coalesce(lower(c) === "true", lit(false))

  /** Integer.parseInt; missing/malformed → null (malformed routes to
    * failure in strict mode — see [[project]]'s route column). try_cast,
    * not cast: Spark 4 ANSI mode makes a plain cast THROW on malformed
    * input, but the reference catches NumberFormatException and routes —
    * null + the route column is the faithful mapping.
    */
  def intAttr(c: Column): Column = c.try_cast(IntegerType)

  def longAttr(c: Column): Column = c.try_cast(LongType)

  def doubleAttr(c: Column): Column = c.try_cast(DoubleType)

  /** Epoch-millis string → TimestampType (UTC session TZ assumed). */
  def epochMillisAttr(c: Column): Column = timestamp_millis(c.try_cast(LongType))

  /** Render a timestamp as the reference's `$date` ISO string. */
  def isoMillis(ts: Column): Column = date_format(ts, IsoMillisFormat)

  import org.apache.spark.sql.graft.ColumnBridge

  /** JSON array string "[1.5,2.5]" → 4.0. A native single-pass codegen'd
    * expression (graft.plans.JsonDoubleArraySum) — no per-row Jackson
    * parse, no interpreted fold. Malformed input (or any malformed
    * element) → null, which [[project]] routes to failure like the
    * reference's catch block.
    */
  def doubleArraySum(c: Column): Column =
    ColumnBridge.column(
      graft.plans.JsonDoubleArraySum(ColumnBridge.expression(c)))

  /** JSON array string "[1,2,3]" → 6L. */
  def intArraySum(c: Column): Column =
    ColumnBridge.column(
      graft.plans.JsonLongArraySum(ColumnBridge.expression(c)))

  /** Project typed columns out of a `MAP<STRING,STRING>` attributes column
    * per the config. Returns the list of aliased columns (caller composes
    * them into a select). Empty config ⇒ the whole attribute map passes
    * through (select-all fallback, BetterAttributesToJSON.java:221-223).
    */
  def projectedColumns(attrs: Column, cfg: TypedProjection): Seq[Column] =
    if (cfg.isEmpty) Seq(attrs.as("attributes"))
    else {
      def get(k: String): Column = element_at(attrs, k)
      cfg.strings.map(k => stringAttr(get(k)).as(k)) ++
        cfg.booleans.map(k => booleanAttr(get(k)).as(k)) ++
        cfg.ints.map(k => intAttr(get(k)).as(k)) ++
        cfg.doubles.map(k => doubleAttr(get(k)).as(k)) ++
        cfg.epochMillisDates.map(k => epochMillisAttr(get(k)).as(k)) ++
        cfg.doubleArraySums.map(k => doubleArraySum(get(k)).as(k)) ++
        cfg.intArraySums.map(k => intArraySum(get(k)).as(k))
    }

  /** Full operator: attributes DataFrame → typed DataFrame with routing.
    * Rows where a configured int/double attribute is present but malformed
    * route to failure, mirroring the catch-and-route at
    * BetterAttributesToJSON.java:368-371 (the reference throws on
    * Integer.parseInt of garbage and routes the FlowFile to failure).
    */
  def project(
      df: DataFrame,
      attrsCol: String,
      cfg: TypedProjection,
      passthrough: Seq[String] = Nil
  ): DataFrame = {
    import graft.model.Route
    val attrs = col(attrsCol)
    def present(k: String): Column = element_at(attrs, k).isNotNull
    def malformed(k: String, t: DataType): Column =
      present(k) && element_at(attrs, k).try_cast(t).isNull
    val badInt = cfg.ints.map(malformed(_, IntegerType))
    val badDouble = cfg.doubles.map(malformed(_, DoubleType))
    val badEpoch = cfg.epochMillisDates.map(malformed(_, LongType))
    val anyBad =
      (badInt ++ badDouble ++ badEpoch).reduceOption(_ || _).getOrElse(lit(false))
    val route = when(anyBad, Route.Failure).otherwise(Route.Success)
    val err =
      when(anyBad, lit("number format error")).otherwise(lit(null).cast(StringType))
    df.select(
      passthrough.map(col) ++
        projectedColumns(attrs, cfg) :+
        route.as(Route.RouteCol) :+ err.as(Route.ErrorCol): _*
    )
  }
}
