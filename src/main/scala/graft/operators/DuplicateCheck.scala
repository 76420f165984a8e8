package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Route

/**
 * Insert-with-duplicate-routing — Spark re-expression of the reference's
 * PutMongoWithDuplicateCheck (PutMongoWithDuplicateCheck.java:117-167).
 *
 * The reference inserts one record at a time and sniffs the Mongo error
 * message for "duplicate key" (:152-157). Declaratively that is:
 *   - rows whose key already exists → `already-exists`
 *   - new rows → inserted → `success`
 *   - duplicates WITHIN the incoming batch beyond the first also collide
 *     (sequential inserts: the first wins, later ones error) — modeled
 *     with row_number over the incoming batch.
 *
 * Scale notes: one left-semi-shaped join against existing keys, broadcast
 * when the incoming batch is small (typical), shuffle otherwise; the
 * intra-batch dedup is a window over the key — same shuffle, reused.
 */
object DuplicateCheck {

  /** Route each incoming row: first-occurrence-and-new → success (these are
    * the rows to insert), anything else → already-exists.
    */
  def route(
      incoming: DataFrame,
      existing: DataFrame,
      keys: Seq[String],
      orderCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val ex = existing.select(keys.map(col): _*).distinct()
      .withColumn("_exists", lit(true))
    incoming
      .withColumn("_rn", row_number().over(w))
      .join(ex, keys, "left_outer")
      .withColumn(
        Route.RouteCol,
        when(col("_exists").isNotNull || col("_rn") > 1, Route.AlreadyExists)
          .otherwise(Route.Success)
      )
      .drop("_exists", "_rn")
  }

  /** The rows that actually insert (route = success). */
  def toInsert(
      incoming: DataFrame,
      existing: DataFrame,
      keys: Seq[String],
      orderCol: String
  ): DataFrame =
    route(incoming, existing, keys, orderCol)
      .filter(col(Route.RouteCol) === Route.Success)
      .drop(Route.RouteCol)
}
