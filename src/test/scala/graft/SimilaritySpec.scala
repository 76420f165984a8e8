package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, Array(1.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f)),
    (3L, Array(0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f))
  ).toDF("id", "vec")

  test("brute-force top-k ranks by cosine") {
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("qid", "qvec")
    val out = Similarity.bruteForceTopK(corpus, "id", "vec", q, "qid", "qvec", 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.toSeq == Seq((2L, 1), (3L, 2)))
  }

  test("ivf with nprobe = #centroids equals brute force") {
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("qid", "qvec")
    val cents = Similarity.seedCentroids(corpus, "id", "vec", 2)
    val assigned = Similarity.assignToCentroids(corpus, "id", "vec", cents)
    val ivf = Similarity.ivfTopK(assigned, "id", "vec", cents, q, "qid", "qvec", 2, nprobe = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    val bf = Similarity.bruteForceTopK(corpus, "id", "vec", q, "qid", "qvec", 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(ivf.toSeq == bf.toSeq)
  }

  test("ivf nprobe=1 prunes to the query's own cluster and stays exact within it") {
    // three orthogonal clusters of 10 vectors each; explicit axis
    // centroids so the cell structure is known. A query from cluster 0
    // with nprobe=1 scans ~1/3 of the corpus yet returns exactly its
    // cluster-mates (the IVF contract: pruned scan, exact in the cell)
    val vecs = (0 until 30).map { i =>
      val axis = i % 3
      val v = Array(0.0f, 0.0f, 0.0f)
      v(axis) = 1.0f
      v((axis + 1) % 3) = 0.01f * (i / 3) // within-cluster spread
      (i.toLong, v)
    }.toDF("id", "vec")
    val cents = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.0f)),
      (102L, Array(0.0f, 0.0f, 1.0f))).toDF("centroid_id", "centroid_vec")
    val assigned = Similarity.assignToCentroids(vecs, "id", "vec", cents)
    // clusters land in their own cells
    assert(assigned.filter($"id" % 3 === 0).select("centroid_id").as[Long]
      .collect().forall(_ == 100L))
    val q = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qvec")
    val out = Similarity.ivfTopK(assigned, "id", "vec", cents, q, "qid", "qvec",
        k = 5, nprobe = 1)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(out.size == 5)
    assert(out.forall(_ % 3 == 0), out.toString) // only cluster-0 members
  }

  test("assignToCentroids: every corpus row gets exactly one centroid") {
    val cents = Similarity.seedCentroids(corpus, "id", "vec", 2)
    val assigned = Similarity.assignToCentroids(corpus, "id", "vec", cents)
    assert(assigned.count() == 4)
    assert(assigned.columns.contains("centroid_id"))
  }
}
