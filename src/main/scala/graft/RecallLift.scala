package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement main for the IVFADC residual-coding recall claim: runs
  * [[graft.operators.Similarity.ivfPqRecallE6]] RAW vs RESIDUAL at
  * identical (m, nprobe) over the `embeddings` table of
  * `SPARK_GRAFT_SF_DIR` — the `ann_ivfpq_residual_recall` gate
  * construction widened to a 32-query sample and both probe depths —
  * and prints one JSON line with the mean recall per variant. The
  * spec pins the lift on a planted two-cluster fixture
  * (SimilaritySpec); this main puts a MEASUREMENT behind the claim at
  * gate scale (recorded in README). Not a gate: the per-query values
  * are already oracle-replayed by `ann_ivfpq_residual_recall`.
  */
object RecallLift {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val coarse = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"),
        transform(col("embedding"),
          v => floor(v.cast("double") * 1000000d).cast("long")).as("centroid_e6"))
    val rawSeeds = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
    val cbRaw = Similarity.pqCodebooksFromSums(
      Similarity.pqTrainSumsE6(emb, "vec_id", "embedding", rawSeeds, m = 4))
    val resSeeds = Similarity.ivfResidualsE6(emb, "vec_id", "embedding", coarse)
      .filter(col("vec_id") >= 4 && col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"),
        col("residual_e6").as("centroid_e6"))
    val cbRes = Similarity.pqCodebooksFromSums(
      Similarity.pqTrainSumsResidualE6(emb, "vec_id", "embedding", coarse,
        resSeeds, m = 4))
    val outRaw = java.nio.file.Files.createTempDirectory("graft-rlift-raw").toString
    val outRes = java.nio.file.Files.createTempDirectory("graft-rlift-res").toString
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", coarse, cbRaw, outRaw)
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", coarse, cbRes, outRes,
      residual = true)
    val q = emb.filter(col("vec_id") < 32)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def mean(indexPath: String, cb: org.apache.spark.sql.DataFrame,
        nprobe: Int, residual: Boolean): Double =
      Similarity.ivfPqRecallE6(emb, "vec_id", "embedding", indexPath, coarse,
          cb, q, "qid", "qvec", k = 10, nprobe = nprobe, residual = residual)
        .agg(avg(col("recall_ppm"))).head().getDouble(0) / 1e6
    val rows = for (np <- Seq(1, 4)) yield {
      val r = mean(outRaw, cbRaw, np, residual = false)
      val s = mean(outRes, cbRes, np, residual = true)
      s""""nprobe_$np":{"raw":$r,"residual":$s}"""
    }
    println(s"""{"metric":"recall_lift","k":10,"m":4,"queries":32,""" +
      rows.mkString(",") + s""","sf":"$sfDir"}""")
    spark.stop()
  }
}

/** Measurement main for the multi-probe mutual-k-NN recall claim: edge
  * recall of [[graft.operators.Similarity.mutualKnnEdgesProbedE6]]
  * against the exact sample-tier graph
  * ([[graft.operators.Similarity.mutualKnnEdgesE6]]) at MATCHED cells,
  * swept over nprobe — the RecallLift protocol applied to the
  * neighborhood graph (nprobe=1 is the blocked operator by reduction).
  * Prints one JSON line; recorded as the README recall-vs-nprobe table.
  * Not a gate: the probed edges are already oracle-replayed by
  * `embedding_mutual_knn_probed`.
  */
object MutualKnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nCells = 16
    val cells = emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("centroid_id"),
        transform(col("embedding"),
          v => floor(v.cast("double") * 1000000d).cast("long"))
          .as("centroid_e6"))
    val k = 3
    def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = edges(Similarity.mutualKnnEdgesE6(emb, "vec_id",
      "embedding", k))
    val rows = for (np <- Seq(1, 2, 4, 8, nCells)) yield {
      val probed = edges(Similarity.mutualKnnEdgesProbedE6(emb, "vec_id",
        "embedding", cells, k, np))
      val hit = (probed & exact).size
      s""""nprobe_$np":{"edges":${probed.size},"exact_hit":$hit,""" +
        s""""recall":${hit.toDouble / math.max(exact.size, 1)}}"""
    }
    println(s"""{"metric":"mutual_knn_recall","k":$k,"cells":$nCells,""" +
      s""""exact_edges":${exact.size},""" +
      rows.mkString(",") + s""","sf":"$sfDir"}""")
    spark.stop()
  }
}
