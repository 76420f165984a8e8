package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `GeoTile(lat, lon, zoom)` — a native Catalyst expression producing the
 * WebMercator slippy-map tile id `"z/x/y"`, with full whole-stage-codegen
 * support (`doGenCode` emits a static call, no boxing, no UDF
 * serialization). SURVEY §7.4 names this the one custom-Expression
 * candidate in the engine: the composed-builtin version
 * (Binning.geoTileId) builds the same id from ~10 expression nodes per
 * zoom level; this collapses it to one.
 *
 * Semantics are identical to Binning.geoTileId (same clamp, same floor):
 * GeoTileExpressionSpec pins the equivalence on the events table.
 *
 * Tile math is the public OSM/slippy-map convention
 * (DataBinningProcessor.java:179-197 is the reference call site).
 */
case class GeoTile(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(DoubleType, DoubleType, IntegerType)
    val actual = children.map(_.dataType)
    if (actual == expected) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_geotile requires (DOUBLE, DOUBLE, INT), got (${actual.mkString(", ")})")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_geotile"

  override protected def nullSafeEval(lat: Any, lon: Any, zoom: Any): Any =
    UTF8String.fromString(
      GeoTile.tileId(lat.asInstanceOf[Double], lon.asInstanceOf[Double],
        zoom.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat, lon, z) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.GeoTile.tileId($lat, $lon, $z))")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object GeoTile {

  /** WebMercator latitude domain bound (the standard ±85.05112878°). */
  val MaxLat = 85.05112878

  /** Pure tile math shared by interpreted eval and generated code. Latitude
    * is clamped to the WebMercator domain so poles don't hit the tan/log
    * singularity (matches Binning.geoTileId).
    */
  def tileId(lat: Double, lon: Double, zoom: Int): String = {
    val n = math.pow(2.0, zoom)
    val maxIdx = n - 1
    val x0 = math.floor((lon + 180.0) / 360.0 * n)
    val latRad = math.toRadians(math.min(math.max(lat, -MaxLat), MaxLat))
    val y0 = math.floor(
      (1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0 * n)
    val x = math.min(math.max(x0, 0.0), maxIdx).toLong
    val y = math.min(math.max(y0, 0.0), maxIdx).toLong
    s"$zoom/$x/$y"
  }

  val functionDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_geotile"),
    new ExpressionInfo(classOf[GeoTile].getName, "graft_geotile"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "graft_geotile(lat, lon, zoom) takes 3 arguments")
      GeoTile(children(0), children(1), children(2))
    }
  )

  /** Imperative registration for an existing session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = functionDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}

/** SparkSessionExtensions hook: activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or pass to
  * `SparkSession.builder.withExtensions`). Injects the engine's native
  * expressions into the session's function registry.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** Every native function the engine ships. */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      GeoTile.functionDescriptor,
      TopKAggregate.functionDescriptor,
      TopKAggregate.bottomKDescriptor,
      JsonNumArraySum.doubleDescriptor,
      JsonNumArraySum.longDescriptor,
      NormalizeText.functionDescriptor,
      WhitespaceTokens.functionDescriptor,
      WordShingles.functionDescriptor,
      CharShingles.functionDescriptor,
      DotProduct.functionDescriptor,
      PunctCount.functionDescriptor,
      SimHash64.functionDescriptor,
      MinHashSig.functionDescriptor,
      SimHashFromShingles.functionDescriptor,
      SigOverlap.functionDescriptor,
      SrpBucket.functionDescriptor,
      FnvHash64.functionDescriptor,
      Winnow.functionDescriptor,
      TopTokenFreq.functionDescriptor,
      CjkTokenCount.functionDescriptor,
      ScriptCounts.functionDescriptor,
      Quantize8.functionDescriptor,
      QDot.functionDescriptor,
      NfcNormalize.functionDescriptor,
      SubwordCount.functionDescriptor,
      BpeEncodeCount.functionDescriptor,
      UrlHost.functionDescriptor,
      RegisteredDomain.functionDescriptor,
      CanonicalUrl.functionDescriptor,
      ArrayInversions.functionDescriptor)

  /** Imperative all-at-once registration for an existing session. */
  def registerAll(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
