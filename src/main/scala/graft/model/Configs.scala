package graft.model

/**
 * Config case classes for the graft engine.
 *
 * These mirror the configuration surface of the reference processors
 * (see SURVEY.md §1.4) but are plain Scala data; operators compile them
 * into Catalyst `Column` expressions at plan-build time, so config
 * interpretation happens once per query, never per row.
 */

/** Routing discriminator values — the Spark mapping of NiFi relationships
  * (reference: multiple named output relationships per processor, e.g.
  * BetterAttributesToJSON.java:142-145, PartialUpdateMongo.java:67-70).
  * An operator that routes returns a DataFrame with a `_route` column
  * (and `_error` when `_route = failure`); downstream consumers filter.
  */
object Route {
  val Success = "success"
  val Failure = "failure"
  val SuccessUnmodified = "success-unmodified"
  val Original = "original"
  val AlreadyExists = "already-exists"
  val Bin = "bin"
  val RouteCol = "_route"
  val ErrorCol = "_error"
}

/** Typed-projection config: which attributes to pull out of the string
  * attribute map and what type to coerce each to.
  * Reference: seven comma-separated property lists,
  * BetterAttributesToJSON.java:65-140.
  *
  * Null-default asymmetry preserved exactly (SURVEY §7.5 #1):
  * missing string → "", missing boolean → false,
  * missing int/double/date → null.
  */
final case class TypedProjection(
    strings: Seq[String] = Nil,
    booleans: Seq[String] = Nil,
    ints: Seq[String] = Nil,
    doubles: Seq[String] = Nil,
    epochMillisDates: Seq[String] = Nil,
    doubleArraySums: Seq[String] = Nil,
    intArraySums: Seq[String] = Nil
) {
  def isEmpty: Boolean =
    strings.isEmpty && booleans.isEmpty && ints.isEmpty && doubles.isEmpty &&
      epochMillisDates.isEmpty && doubleArraySums.isEmpty && intArraySums.isEmpty
}

/** Security-marking parser config.
  * Reference schema: FlowAttrSecurityConfig.java:14-23 (6 string arrays +
  * delimiter), consumed at ConvertSecurityMarkingAndAttrListIntoJson.java:429-430.
  */
final case class SecurityConfig(
    levelsToConvertTo: Seq[String],
    levelsCanReceive: Seq[String],
    abbreviatedLevelsCanReceive: Seq[String],
    compartments: Seq[String],
    disseminationControls: Seq[String],
    releasabilities: Seq[String],
    delim: String = "_"
)

/** Output schema of the security parser — 4 string lists
  * (reference: Classification.java:18-24).
  */
final case class Classification(
    levels: Seq[String],
    compartments: Seq[String],
    releasabilities: Seq[String],
    disseminationControls: Seq[String]
)

/** Binner specs — the "query plan" of the reference's analytics path
  * (DataBinningProcessor.java:128-227 compiles JSON config into a
  * List[Binner]; we compile these specs into Column generators).
  *
  * Bin-name format (ours to define per SURVEY §2.3, deterministic +
  * hierarchical): `<binName>.<levelValue>` with one name emitted per
  * hierarchy level, e.g. `time.2024`, `time.2024-01`, `time.2024-01-15`.
  */
sealed trait BinnerSpec { def binName: String }

object DateGranularity extends Enumeration {
  val YEAR, MONTH, DAY, HOUR, MIN = Value
  /** Invalid granularity → MIN, mirroring DataBinningProcessor.java:154-159. */
  def parse(s: String): Value =
    values.find(_.toString.equalsIgnoreCase(s)).getOrElse(MIN)
}

/** One bin name per granularity level from YEAR down to `granularity`
  * (DataBinningProcessor.java:151-164; hierarchy semantics per SURVEY §2.3).
  */
final case class DateBinner(
    binName: String,
    dataFieldName: String,
    granularity: DateGranularity.Value
) extends BinnerSpec

/** One bin per literal field value (DataBinningProcessor.java:165-169). */
final case class LiteralBinner(binName: String, dataFieldName: String)
    extends BinnerSpec

/** Hierarchical numeric range bins: level L covers width 10^(maxLevel-L),
  * names `bin.<lo>-<hi>` for L = 1..maxLevel
  * (DataBinningProcessor.java:170-178).
  */
final case class NumericBinner(binName: String, dataFieldName: String, maxLevel: Int)
    extends BinnerSpec

/** Slippy-map (WebMercator) tile ids for zoom 0..maxLevel from a lat/lon
  * pair (DataBinningProcessor.java:179-197). Names `bin.<z>/<x>/<y>`.
  */
final case class GeoTileBinner(
    binName: String,
    latFieldName: String,
    lonFieldName: String,
    maxLevel: Int
) extends BinnerSpec

/** Cross-product of previously-defined binners' names
  * (DataBinningProcessor.java:198-214). Forward references are a
  * config-compile error for us (eager validation per SURVEY §7.5 #11).
  */
final case class MergedBinner(binName: String, binners: Seq[String])
    extends BinnerSpec

/** Merge (partial-update) spec — the Spark re-expression of
  * PartialUpdateMongo's `{query, update}` document pair
  * (PartialUpdateMongo.java:282-425).
  */
object MergeOp extends Enumeration {
  /** $set | $addToSet | $inc | $currentDate — PartialUpdateMongo.java:80,97-102. */
  val Set, AddToSet, Inc, CurrentDate = Value
}

final case class MergeFieldSpec(
    /** Target field; supports exactly-one-dot `parent.child` nesting
      * (two segments enforced, PartialUpdateMongo.java:537-543). */
    propertyName: String,
    op: MergeOp.Value
) {
  val segments: Array[String] = propertyName.split("\\.")
  require(
    segments.length <= 2,
    s"Nested property '$propertyName' must have exactly 2 segments (parent.child)"
  )
}

final case class MergeSpec(
    /** Comma-separated equality key fields; empty ⇒ match-all
      * (PartialUpdateMongo.java:282-299). */
    keyFields: Seq[String],
    fields: Seq[MergeFieldSpec],
    /** single = at most one state row updated; many = all matching
      * (PartialUpdateMongo.java:456-487). */
    updateMany: Boolean = true,
    /** bulk upsert: unmatched incoming rows are inserted
      * (PartialUpdateMongo.java:431-453). */
    upsert: Boolean = true
)
