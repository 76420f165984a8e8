package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for training-data pipelines: image/audio/
 * video carried as opaque `BINARY` columns with a typed metadata struct,
 * processed in partition-batched passes.
 *
 * The actual media kernels (JPEG decode, resample, frame extraction) need
 * native libraries that are NOT in this environment, so each kernel is a
 * clearly-marked STUB with a deterministic fake — but the Spark-side
 * plumbing is real and tested: schema contract, partition batching,
 * task-level reuse of a (fake) decoder context, explode shape for frame
 * sampling, and narrow/no-shuffle execution. Swapping in a real decoder
 * changes only the function body, not the plan shape.
 *
 * Scale notes (100 TB): media bytes dominate row size, so every operator
 * here is narrow (no shuffle touches the binary column); frame sampling
 * explodes bounded arrays; feature extraction emits fixed-length vectors,
 * and downstream ops (dedup, ANN) run on those — the bytes are read once.
 */
object Multimodal {

  /** Typed metadata carried alongside the opaque bytes. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("durationMs", LongType),
    StructField("codec", StringType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", MediaMetaType)))

  final case class MediaMeta(
      mime: String, width: Option[Int], height: Option[Int],
      durationMs: Option[Long], codec: Option[String])
  final case class MediaRecord(media_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, features: Array[Float], n_bytes: Long)
  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB decoder context — stands in for a native decoder handle that is
    * expensive to create. The plumbing point: it is created ONCE PER
    * PARTITION (mapPartitions), exactly where a real libjpeg/ffmpeg
    * context would be, never per row and never on the driver.
    */
  private final class StubDecoder(dim: Int) {
    /** STUB: a real implementation decodes pixels and runs a vision
      * encoder. The fake derives `dim` deterministic floats by hashing
      * the bytes — stable across runs/partitionings, so tests can assert
      * exact values.
      */
    def features(bytes: Array[Byte]): Array[Float] = {
      val h0 = java.util.Arrays.hashCode(bytes).toLong
      Array.tabulate(dim) { i =>
        val h = h0 * 6364136223846793005L + i * 1442695040888963407L
        ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
      }
    }
    /** STUB: a real implementation samples decoded video frames. The fake
      * slices the byte array into `n` chunks so the explode shape and
      * byte accounting are real.
      */
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val len = math.max(bytes.length, 1)
      (0 until math.min(n, len)).map { i =>
        java.util.Arrays.copyOfRange(bytes, i * len / n, math.max((i + 1) * len / n, i * len / n + 1))
      }
    }
  }

  /** Feature extraction: one narrow partition-batched pass over the media
    * table → fixed-length Float vectors. The Scala analogue of a
    * `mapInPandas` batch UDF: the iterator is the batch, the decoder is
    * partition-scoped state.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = new StubDecoder(dim) // per-partition decoder context
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          MediaFeatures(id, dec.features(b), b.length.toLong)
        }
      }
      .toDF()
  }

  /** Frame sampling: media row → up to `n` frame rows. Bounded explode —
    * the output is `n × rows`, never unbounded.
    */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = new StubDecoder(0)
        it.flatMap { case (id, bytes) =>
          val b = if (bytes == null) Array.emptyByteArray else bytes
          dec.sampleFrames(b, n).zipWithIndex.map { case (f, i) => Frame(id, i, f) }
        }
      }
      .toDF()
  }

  /** Metadata-only resize: plan-level proof that metadata transforms never
    * touch the binary column (column pruning keeps `content` out of the
    * scan when only the resized metadata is selected). The pixel resample
    * itself is part of the STUB decode kernel.
    */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val scale = when(greatest(w, h) > maxSide,
      lit(maxSide.toDouble) / greatest(w, h).cast(DoubleType)).otherwise(lit(1.0))
    media.withColumn("resized_meta", struct(
      col("meta.mime").as("mime"),
      (w * scale).cast(IntegerType).as("width"),
      (h * scale).cast(IntegerType).as("height"),
      col("meta.durationMs").as("durationMs"),
      col("meta.codec").as("codec")))
  }

  /** Exact multimodal dedup — identical binary payloads collapse to
    * one keeper (re-uploaded images, mirrored videos: the highest-yield
    * dedup in any crawled media corpus is byte-identical copies).
    * Output: one row per input — `(idCol, keeper_id, group_size)`,
    * keeper = min id of the payload's group. The text-dedup discipline
    * applied to media: the shuffle carries `(xxhash64(content),
    * length)` — 8 + 8 bytes per asset, the payload itself NEVER
    * shuffles; collision-tolerant by the dedup-family 2⁻⁶⁴ argument
    * (the length in the key cuts it further).
    */
  def dedupExactBinary(media: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val fp = media.select(col(idCol),
      xxhash64(col(bytesCol)).as("_fp"),
      length(col(bytesCol)).cast("long").as("_len"))
    val groups = fp.groupBy("_fp", "_len")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("group_size"))
    fp.join(groups, Seq("_fp", "_len"))
      .select(col(idCol), col("keeper_id"), col("group_size"))
  }

  /** Deterministic synthetic media table for tests/benches: bytes derived
    * from the id (no media libs involved).
    */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, rows: Int): DataFrame = {
    import spark.implicits._
    spark.range(rows.toLong).select(col("id").as("media_id"))
      .as[Long]
      .map { id =>
        val bytes = Array.tabulate(64 + (id % 64).toInt)(i => ((id * 31 + i) % 251).toByte)
        MediaRecord(id, bytes,
          MediaMeta("image/synthetic", Some(640), Some(480), None, None))
      }
      .toDF()
  }
}
