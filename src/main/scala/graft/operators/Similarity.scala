package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 * Two paths:
 *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
 *    A broadcast of the (small) query set against the (huge) corpus:
 *    narrow scan + per-partition top-k via window; at 100 TB this is one
 *    pass over the corpus with no corpus-side shuffle (queries broadcast,
 *    the final top-k reduction shuffles only k rows per query).
 *  - `ivfTopK`: IVF-style pruning — corpus pre-assigned to the nearest of
 *    C centroids (one narrow pass, assignment persisted with the data at
 *    real scale); a query probes only its `nprobe` nearest centroids'
 *    partitions, cutting the scanned fraction to ~nprobe/C.
 */
object Similarity {

  /** Exact top-k by cosine for each query row. `queries` is expected to be
    * small (broadcast); `corpus` is the big side.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int
  ): DataFrame = {
    val scored = corpus
      .join(broadcast(queries))
      .select(
        col(queryId).as("query_id"),
        col(corpusId).as("neighbor_id"),
        cosine(col(queryVec), col(corpusVec)).as("cosine")
      )
      .filter(col("query_id") =!= col("neighbor_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Assign every vector to the nearest of `centroids` (id, vec) by
    * cosine. One narrow pass; centroids broadcast. The argmax window is
    * keyed on `corpusId` alone — partitioning by every corpus column
    * would shuffle-hash the embedding arrays themselves.
    */
  def assignToCentroids(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      centroids: DataFrame, // columns: centroid_id, centroid_vec
      metric: (Column, Column) => Column = cosine
  ): DataFrame = {
    val scored = corpus.join(broadcast(centroids))
      .withColumn("_sim", metric(col(corpusVec), col("centroid_vec")))
    val w = Window.partitionBy(col(corpusId))
      .orderBy(col("_sim").desc, col("centroid_id").asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_sim", "_rn", "centroid_vec")
  }

  /** IVF top-k: probe only the `nprobe` centroids nearest to each query.
    * `assigned` = corpus with a `centroid_id` column (from
    * [[assignToCentroids]], precomputed/persisted at scale).
    */
  def ivfTopK(
      assigned: DataFrame,
      corpusId: String,
      corpusVec: String,
      centroids: DataFrame,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      nprobe: Int
  ): DataFrame = {
    // nprobe nearest centroids per query (tiny: queries × centroids)
    val qc = queries.join(broadcast(centroids))
      .withColumn("_sim", cosine(col(queryVec), col("centroid_vec")))
    val wq = Window.partitionBy(queryId)
      .orderBy(col("_sim").desc, col("centroid_id").asc)
    val probes = qc.withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= nprobe)
      .select(col(queryId), col(queryVec), col("centroid_id"))

    // scan only the probed partitions of the corpus
    val scored = assigned
      .join(broadcast(probes), Seq("centroid_id"))
      .select(
        col(queryId).as("query_id"),
        col(corpusId).as("neighbor_id"),
        cosine(col(queryVec), col(corpusVec)).as("cosine")
      )
      .filter(col("query_id") =!= col("neighbor_id"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic centroid seeding without a kmeans dependency: take the
    * `c` corpus vectors with the smallest xxhash64(id) — uniform pseudo-
    * random, reproducible, one pass.
    */
  def seedCentroids(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      c: Int
  ): DataFrame =
    corpus
      .select(col(corpusId), col(corpusVec), xxhash64(col(corpusId)).as("_h"))
      .orderBy("_h")
      .limit(c)
      .select(
        col(corpusId).as("centroid_id"),
        col(corpusVec).as("centroid_vec")
      )
}
