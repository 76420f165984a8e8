package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model._

/**
 * Multi-dimensional binning — the Spark re-expression of the reference's
 * DataBinningProcessor (DataBinningProcessor.java:128-319) and the five
 * binner types it configures (SURVEY §2.3).
 *
 * Design: each binner compiles to a single `Column` of
 * `ARRAY<STRING>` bin names; the fan-out (record → N `{name, count:1}`
 * rows, DataBinningProcessor.java:251-266) is `explode`; the deferred
 * aggregation the reference leaves to downstream consumers
 * (`count: 1`, DataBinningProcessor.java:261) is completed here with a
 * hash aggregate (`groupBy(name).sum(count)` — partial + final agg, one
 * shuffle keyed on the bin name, map-side combine for free).
 *
 * Scale notes (100 TB): all binners are narrow generators — no shuffle
 * until the count aggregate, whose key cardinality is bounded by
 * (levels × distinct bins), tiny relative to input. Skewed bin names
 * (e.g. one hot literal) are absorbed by partial aggregation; AQE handles
 * residual skew. Everything stays inside whole-stage codegen (built-in
 * expressions only — no UDFs).
 */
object Binning {

  /** Date hierarchy formats per granularity, YEAR down to MIN. Bin names
    * are `<binName>.<formatted>`, one per level from YEAR to the
    * configured granularity (hierarchical rollup per SURVEY §2.3).
    */
  private val dateFormats: Seq[(DateGranularity.Value, String)] = Seq(
    DateGranularity.YEAR -> "yyyy",
    DateGranularity.MONTH -> "yyyy-MM",
    DateGranularity.DAY -> "yyyy-MM-dd",
    DateGranularity.HOUR -> "yyyy-MM-dd-HH",
    DateGranularity.MIN -> "yyyy-MM-dd-HH-mm"
  )

  def dateBinNames(binName: String, ts: Column, g: DateGranularity.Value): Column = {
    // every coarser level is a '-'-separated-field PREFIX of the finest
    // one (the format literals nest: yyyy ⊂ yyyy-MM ⊂ ...), so format
    // ONCE at the target granularity and take the first k fields with
    // substring_index — one DateTimeFormatter pass per row instead of one
    // per level (codegen CSE shares the date_format subtree). Field-based
    // cutting, not fixed offsets: java.time's "yyyy" is year-of-era
    // (never negative) rendered with EXCEEDS_PAD, so an out-of-range year
    // prints as e.g. "+56000" — wider than 4 chars but still the first
    // '-'-field, binning identically to the per-level form.
    val levels0 = dateFormats.takeWhile(_._1.id <= g.id)
    val finest = date_format(ts, levels0.last._2)
    val levels = levels0.zipWithIndex.map { case (_, i) =>
      concat(lit(s"$binName."), substring_index(finest, "-", i + 1))
    }
    when(ts.isNull, array().cast(ArrayType(StringType)))
      .otherwise(array(levels: _*))
  }

  /** One bin per literal value: `<binName>.<value>`
    * (DataBinningProcessor.java:165-169).
    */
  def literalBinNames(binName: String, v: Column): Column =
    when(v.isNull, array().cast(ArrayType(StringType)))
      .otherwise(array(concat_ws(".", lit(binName), v.cast(StringType))))

  /** Hierarchical numeric range bins, level 0..maxLevel, level ℓ has
    * width 10^ℓ: name `<binName>.L<ℓ>.<floor(v / 10^ℓ) * 10^ℓ>`
    * (DataBinningProcessor.java:170-178; exact name format is ours,
    * SURVEY §2.3).
    */
  def numericBinNames(binName: String, v: Column, maxLevel: Int): Column = {
    val levels = (0 to maxLevel).map { l =>
      val width = math.pow(10, l).toLong
      val lo = floor(v.cast(DoubleType) / width).cast(LongType) * width
      concat(lit(s"$binName.L$l."), lo.cast(StringType))
    }
    when(v.isNull, array().cast(ArrayType(StringType)))
      .otherwise(array(levels: _*))
  }

  /** WebMercator slippy-map tile id `z/x/y` for one zoom level.
    * Standard OSM tile math: x = floor((lon+180)/360 * 2^z),
    * y = floor((1 - ln(tan(lat) + 1/cos(lat)) / π) / 2 * 2^z), clamped to
    * [0, 2^z - 1]. (DataBinningProcessor.java:179-197; tile math from the
    * public slippy-map convention.)
    */
  def geoTileId(lat: Column, lon: Column, zoom: Int): Column = {
    // the native codegen'd expression (graft.plans.GeoTile) — one node per
    // tile id vs ~10 composed builtins; GeoTileExpressionSpec pins the
    // bit-identical equivalence with the composed form
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.GeoTile(
      ColumnBridge.expression(lat.cast(DoubleType)),
      ColumnBridge.expression(lon.cast(DoubleType)),
      ColumnBridge.expression(lit(zoom))))
  }

  /** The composed-builtin tile id, kept as the reference implementation
    * the equivalence spec checks the native expression against.
    */
  def geoTileIdComposed(lat: Column, lon: Column, zoom: Int): Column = {
    val n = lit(math.pow(2.0, zoom))
    val x0 = floor((lon + lit(180.0)) / lit(360.0) * n)
    // clamp to the WebMercator domain: at the poles tan/log is singular and
    // Spark's log returns NULL for non-positive input (vs NaN natively)
    val latRad = radians(least(greatest(lat, lit(-graft.plans.GeoTile.MaxLat)),
      lit(graft.plans.GeoTile.MaxLat)))
    val y0 = floor(
      (lit(1.0) - log(tan(latRad) + lit(1.0) / cos(latRad)) / lit(math.Pi)) /
        lit(2.0) * n
    )
    val maxIdx = lit(math.pow(2.0, zoom) - 1)
    val x = least(greatest(x0, lit(0.0)), maxIdx).cast(LongType)
    val y = least(greatest(y0, lit(0.0)), maxIdx).cast(LongType)
    concat_ws("/", lit(zoom.toString), x.cast(StringType), y.cast(StringType))
  }

  /** Tile ids for zoom 0..maxLevel: `<binName>.<z>/<x>/<y>`
    * (DataBinningProcessor.java:179-197).
    */
  def geoTileBinNames(binName: String, lat: Column, lon: Column, maxLevel: Int): Column = {
    val levels = (0 to maxLevel).map { z =>
      concat(lit(s"$binName."), geoTileId(lat, lon, z))
    }
    when(lat.isNull || lon.isNull, array().cast(ArrayType(StringType)))
      .otherwise(array(levels: _*))
  }

  /** Cross-product of constituent binners' name arrays, joined with "|":
    * `<binName>.<a>|<b>` (DataBinningProcessor.java:198-214).
    */
  def mergedBinNames(binName: String, constituents: Seq[Column]): Column = {
    require(constituents.nonEmpty, s"MergedBinner $binName has no constituents")
    // native one-pass cross product (graft.plans.CrossConcat): the composed
    // flatten(transform(acc, a => transform(next, b => concat(a,"|",b))))
    // reduce is an interpreted HOF chain re-evaluated per row per element;
    // BinningSpec pins the equivalence against that composed form
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.CrossConcat(
      s"$binName.", "|", constituents.map(ColumnBridge.expression)))
  }

  /** The composed-HOF merged binner, kept as the reference implementation
    * the equivalence spec checks the native CrossConcat against.
    */
  def mergedBinNamesComposed(binName: String, constituents: Seq[Column]): Column = {
    require(constituents.nonEmpty, s"MergedBinner $binName has no constituents")
    val crossed = constituents.reduceLeft { (acc, next) =>
      flatten(transform(acc, a => transform(next, b => concat(a, lit("|"), b))))
    }
    transform(crossed, nm => concat(lit(s"$binName."), nm))
  }

  /** Compile a binner-spec list into (binName, ARRAY<STRING> column) pairs
    * against `df`'s columns. MergedBinner references are resolved against
    * earlier specs only; a forward/unknown reference is an eager config
    * error (the reference warns-and-drops at runtime,
    * DataBinningProcessor.java:201-208 — we fail fast per SURVEY §7.5 #11).
    */
  def compile(specs: Seq[BinnerSpec]): Seq[(String, Column)] = {
    val registry = scala.collection.mutable.LinkedHashMap.empty[String, Column]
    specs.foreach {
      case DateBinner(name, field, g) =>
        registry += name -> dateBinNames(name, col(field), g)
      case LiteralBinner(name, field) =>
        registry += name -> literalBinNames(name, col(field))
      case NumericBinner(name, field, maxLevel) =>
        registry += name -> numericBinNames(name, col(field), maxLevel)
      case GeoTileBinner(name, latF, lonF, maxLevel) =>
        registry += name -> geoTileBinNames(name, col(latF), col(lonF), maxLevel)
      case MergedBinner(name, parts) =>
        val missing = parts.filterNot(registry.contains)
        require(
          missing.isEmpty,
          s"MergedBinner $name references undefined/forward binners: ${missing.mkString(",")}"
        )
        registry += name -> mergedBinNames(name, parts.map(registry))
    }
    registry.toSeq
  }

  /** Stage one materialized ARRAY<STRING> column per binner
    * (`_bin_<name>`). MergedBinner references the *attributes* of its
    * constituents rather than re-inlining their expression trees —
    * higher-order functions are interpreted (no codegen CSE), so an
    * inlined tree would recompute every constituent per merged element.
    */
  def withBinArrays(df: DataFrame, specs: Seq[BinnerSpec]): (DataFrame, Seq[String]) = {
    val names = specs.map(_.binName)
    val staged = specs.foldLeft(df) { (d, spec) =>
      val c = spec match {
        case DateBinner(name, field, g) => dateBinNames(name, col(field), g)
        case LiteralBinner(name, field) => literalBinNames(name, col(field))
        case NumericBinner(name, field, maxLevel) => numericBinNames(name, col(field), maxLevel)
        case GeoTileBinner(name, latF, lonF, maxLevel) => geoTileBinNames(name, col(latF), col(lonF), maxLevel)
        case MergedBinner(name, parts) =>
          val missing = parts.filterNot(p => specs.takeWhile(_ != spec).exists(_.binName == p))
          require(
            missing.isEmpty,
            s"MergedBinner $name references undefined/forward binners: ${missing.mkString(",")}"
          )
          mergedBinNames(name, parts.map(p => col(s"_bin_$p")))
      }
      d.withColumn(s"_bin_${spec.binName}", c)
    }
    (staged, names.map(n => s"_bin_$n"))
  }

  /** Record → N `{name, count: 1}` rows (the reference's bin fan-out,
    * DataBinningProcessor.java:251-266). Narrow: explode of a concatenated
    * name array, no shuffle.
    */
  def fanOut(df: DataFrame, specs: Seq[BinnerSpec]): DataFrame = {
    val (staged, binCols) = withBinArrays(df, specs)
    staged.select(explode(concat(binCols.map(col): _*)).as("name")).select(
      col("name"),
      lit(1L).as("count")
    )
  }

  /** Fan-out + the deferred count aggregation the reference's `count: 1`
    * design anticipates (SURVEY §0): one hash aggregate, partial+final.
    */
  def binAndCount(df: DataFrame, specs: Seq[BinnerSpec]): DataFrame =
    fanOut(df, specs).groupBy("name").agg(sum("count").as("count"))

  /** Multiple-output mode: one row per input record holding the array of
    * all its bins (DataBinningProcessor.java:292-306). Bounded per-record
    * (levels × binners), so the array never explodes memory at scale.
    */
  def binsPerRecord(df: DataFrame, specs: Seq[BinnerSpec], recordKey: String): DataFrame = {
    val (staged, binCols) = withBinArrays(df, specs)
    staged.select(
      col(recordKey),
      transform(concat(binCols.map(col): _*),
        nm => struct(nm.as("name"), lit(1L).as("count"))).as("bins")
    )
  }
}
