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

  test("assignToCentroids: every corpus row gets exactly one centroid") {
    val cents = Similarity.seedCentroids(corpus, "id", "vec", 2)
    val assigned = Similarity.assignToCentroids(corpus, "id", "vec", cents)
    assert(assigned.count() == 4)
    assert(assigned.columns.contains("centroid_id"))
  }
}
