package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import graft.model._
import graft.operators.{Binning, Merge}

/**
 * Structured Streaming runners for the graft operators.
 *
 * The reference is a continuous dataflow system: `onTrigger` fires per
 * FlowFile forever (e.g. `@EventDriven`, DataBinningProcessor.java:54),
 * with NO watermark/late-data notion — it processes whatever arrives.
 * The Spark mapping (SURVEY §1.3): every narrow operator (typed
 * projection, security marking, bin fan-out) works on a streaming
 * DataFrame unchanged — they are stateless `select`s. What needs explicit
 * streaming treatment is state:
 *
 *  - bin counts: a streaming aggregation. [[binCountsStream]] adds an
 *    event-time window + watermark (the late-data policy is OURS to
 *    define per SURVEY §4.2 — the reference has none, so the watermark
 *    is a parameter).
 *  - keyed merge ($set/$inc/$addToSet): [[mergeStream]] runs the batch
 *    Merge against a persistent state table per micro-batch via
 *    foreachBatch — the streaming analogue of the reference's Mongo
 *    upsert-per-FlowFile (PartialUpdateMongo.java:431-496), with the
 *    whole micro-batch applied as ONE bulk merge (`ordered(false)`
 *    semantics, :451).
 *
 * Scale notes: binCountsStream state is bounded by (watermark horizon ×
 * bin cardinality); mergeStream state is the table itself (parquet here;
 * a Delta/Iceberg MERGE in production), and each micro-batch is one
 * hash-join-shaped merge, partial-aggregated before the shuffle.
 */
object StreamingOps {

  /** Streaming windowed bin counts: fan out bin names (narrow, stateless)
    * then count per (window, name) with a watermark.
    */
  def binCountsStream(
      events: DataFrame,
      specs: Seq[BinnerSpec],
      tsCol: String,
      watermarkDelay: String = "10 minutes",
      windowLen: String = "1 hour"
  ): DataFrame = {
    val (staged, binCols) = Binning.withBinArrays(events, specs)
    staged
      .withWatermark(tsCol, watermarkDelay)
      .select(col(tsCol), explode(concat(binCols.map(col): _*)).as("name"))
      .groupBy(window(col(tsCol), windowLen), col("name"))
      .agg(count(lit(1)).as("count"))
  }

  /** Continuous keyed merge into a parquet state directory. Each
    * micro-batch is collapsed per key and merged into the state table
    * exactly like the batch operator; the state write is atomic-per-batch
    * (overwrite of the state dir via a staging write).
    *
    * Returns the started query; the caller owns its lifecycle.
    */
  def mergeStream(
      incoming: DataFrame,
      spec: MergeSpec,
      orderCol: String,
      statePath: String,
      checkpointPath: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)
  ): StreamingQuery = {
    val spark = incoming.sparkSession
    incoming.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val state = loadState(spark, statePath, batch)
        val merged = Merge.upsertBatch(state, batch.toDF(), spec, orderCol).state
        // stage-then-swap so a failed write never corrupts current state
        val staging = statePath + ".staging"
        merged.write.mode("overwrite").parquet(staging)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val cur = new org.apache.hadoop.fs.Path(statePath)
        fs.delete(cur, true)
        fs.rename(new org.apache.hadoop.fs.Path(staging), cur)
        ()
      }
      .start()
  }

  private def loadState(spark: SparkSession, path: String, like: Dataset[Row]): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path)))
      spark.read.parquet(path)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        like.schema)
  }

  /** Route a streaming DataFrame by its `_route` column into per-route
    * sinks — the NiFi relationship fan-out (SURVEY §1.3). Stateless
    * filters on one source; Spark runs them as independent queries.
    */
  def routeTo(
      routed: DataFrame,
      sinks: Map[String, DataStreamWriter[Row] => StreamingQuery],
      checkpointRoot: String
  ): Seq[StreamingQuery] =
    sinks.toSeq.map { case (route, start) =>
      val branch = routed.filter(col(Route.RouteCol) === route)
      start(
        branch.writeStream
          .option("checkpointLocation", s"$checkpointRoot/$route"))
    }
}
