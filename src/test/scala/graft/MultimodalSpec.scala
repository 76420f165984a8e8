package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.syntheticMedia(spark, 10)

  test("media schema contract: binary content + typed metadata struct") {
    assert(media.schema("content").dataType == org.apache.spark.sql.types.BinaryType)
    assert(media.select("meta.mime").as[String].collect().forall(_ == "image/synthetic"))
  }

  test("feature extraction: fixed-length vectors, deterministic across partitionings") {
    val f1 = Multimodal.extractFeatures(media, dim = 8)
    val f2 = Multimodal.extractFeatures(media.repartition(5), dim = 8)
    assert(f1.select("features").as[Array[Float]].collect().forall(_.length == 8))
    val m1 = f1.select("media_id", "features").as[(Long, Array[Float])].collect()
      .map(r => r._1 -> r._2.toSeq).toMap
    val m2 = f2.select("media_id", "features").as[(Long, Array[Float])].collect()
      .map(r => r._1 -> r._2.toSeq).toMap
    assert(m1 == m2)
  }

  test("feature extraction reports byte counts") {
    val f = Multimodal.extractFeatures(media, 4)
    val n = f.select("media_id", "n_bytes").as[(Long, Long)].collect().toMap
    assert(n(0L) == 64L && n(5L) == 69L)
  }

  test("frame sampling: bounded explode, n frames per media row") {
    val frames = Multimodal.sampleFrames(media, 4)
    assert(frames.count() == 40)
    val perId = frames.groupBy("media_id").count().select("count").as[Long].collect()
    assert(perId.forall(_ == 4L))
    // frames partition the bytes: total frame bytes == media bytes
    val tot = frames.select(sum(length(col("frame_bytes")))).as[Long].collect()(0)
    val orig = media.select(sum(length(col("content")))).as[Long].collect()(0)
    assert(tot == orig)
  }

  test("resizeMeta scales the long side to maxSide and never touches bytes") {
    val out = Multimodal.resizeMeta(media, 320)
    val r = out.select("resized_meta.width", "resized_meta.height")
      .as[(Int, Int)].collect().head
    assert(r == ((320, 240)))
    // plan check: selecting only resized metadata prunes the binary column
    val plan = out.select("media_id", "resized_meta").queryExecution.optimizedPlan.toString
    assert(!plan.contains("content"))
  }

  test("dedupExactBinary: identical payloads group, keeper = min id, payload never shuffles") {
    import graft.operators.Multimodal
    val a = Array[Byte](1, 2, 3, 4)
    val b = Array[Byte](9, 9)
    val d = Seq((1L, a), (2L, b), (5L, a.clone()), (9L, a.clone()))
      .toDF("id", "content")
    val got = Multimodal.dedupExactBinary(d, "id", "content")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((1L, 3L)), 5L -> ((1L, 3L)), 9L -> ((1L, 3L)),
      2L -> ((2L, 1L))), got.toString)
    // the exchange carries fingerprints + lengths, not binary payloads:
    // no shuffle attribute is the content column
    val plan = Multimodal.dedupExactBinary(d, "id", "content")
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty && exchanges.forall(l => !l.contains("content")), plan)
  }
}
