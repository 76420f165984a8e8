package graft.engine

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import graft.model.Route

/**
 * Pipeline composition (SURVEY §7.1 `engine/Pipeline.scala`): chain
 * operators as plain `DataFrame => DataFrame` stages, with NiFi-style
 * relationship routing between them.
 *
 * The reference wires processors through named relationship queues
 * (success/failure/original/..., SURVEY §1.3); here a routed stage tags
 * rows with `_route` and downstream stages consume one route each. A
 * pipeline is itself a stage, so pipelines nest.
 *
 * Because stages are nothing but DataFrame transformations, one Pipeline
 * value runs identically in batch (`run`) and Structured Streaming
 * (`runStream`) — statelessness of the narrow operators is pinned by
 * StreamingNarrowOpsSpec.
 */
final case class Pipeline(stages: Seq[DataFrame => DataFrame]) extends (DataFrame => DataFrame) {

  /** Compose all stages (lazy — nothing executes until an action). */
  override def apply(df: DataFrame): DataFrame =
    stages.foldLeft(df)((d, stage) => stage(d))

  def andThen(next: DataFrame => DataFrame): Pipeline = Pipeline(stages :+ next)

  /** Batch run. */
  def run(df: DataFrame): DataFrame = apply(df)

  /** Streaming run: apply the same stages to a streaming DataFrame and
    * hand the result to the caller's sink starter.
    */
  def runStream(df: DataFrame)(start: DataStreamWriter[Row] => StreamingQuery): StreamingQuery =
    start(apply(df).writeStream)
}

object Pipeline {

  def apply(stage: DataFrame => DataFrame, more: (DataFrame => DataFrame)*): Pipeline =
    Pipeline(stage +: more)

  /** Keep one relationship's rows and drop the routing columns — the
    * "connect this relationship to the next processor" edge.
    */
  def route(name: String): DataFrame => DataFrame =
    df => df.filter(col(Route.RouteCol) === name)
      .drop(Route.RouteCol, Route.ErrorCol)

  /** Split a routed DataFrame into per-relationship DataFrames (batch
    * fan-out; streaming fan-out is StreamingOps.routeTo).
    */
  def split(df: DataFrame, routes: Seq[String]): Map[String, DataFrame] =
    routes.map(r => r -> route(r)(df)).toMap
}
