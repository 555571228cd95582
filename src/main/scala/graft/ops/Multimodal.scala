package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side machinery (schema, partitioning, batch iteration,
  * output shape) is real and tested; the actual media decode is STUBBED
  * with a deterministic fake because no image/audio codec library ships
  * in this environment — swap `decodeStub` for a real decoder (e.g.
  * javacv / TwelveMonkeys) without touching the plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta_source", StringType, nullable = true)))

  /** Feature row produced by the (stubbed) decoder. */
  final case class MediaFeatures(media_id: Long, media_type: String,
      byte_len: Long, checksum: Long, width: Int, height: Int,
      n_frames: Int, feature: Array[Float])

  /** Deterministic fake decode: a real decoder would parse the payload
    * header; the stub derives "dimensions" and a feature vector from a
    * rolling checksum of the bytes. Batch shape per partition matches
    * what a vectorized decode (e.g. via Arrow batches) would use.
    */
  def decodeStub(payload: Array[Byte]): (Long, Int, Int, Array[Float]) = {
    var h = 1469598103934665603L // FNV-1a over the payload
    var i = 0
    while (i < payload.length) { h ^= (payload(i) & 0xff); h *= 1099511628211L; i += 1 }
    val w = 16 + (Math.floorMod(h, 1024L)).toInt
    val ht = 16 + (Math.floorMod(h >>> 10, 1024L)).toInt
    val feat = Array.tabulate(8)(j => (Math.floorMod(h >>> (j * 7), 997L)).toFloat / 997f)
    (h, w, ht, feat)
  }

  /** Distributed feature extraction: one pass, per-partition batches,
    * no shuffle. This is the plumbing a real decoder plugs into.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mt, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          val (checksum, w, h, feat) = decodeStub(bytes)
          val frames = if (mt == "video") 1 + (bytes.length / 64) else 1
          MediaFeatures(id, mt, bytes.length.toLong, checksum, w, h, frames, feat)
        }
      }
  }

  /** Batched variant: decodes in fixed-size batches within each
    * partition — the shape a vectorized decoder (Arrow batch / GPU
    * inference) plugs into. Semantically identical to extractFeatures;
    * the batch boundary is where a real implementation would hand a
    * Seq[Array[Byte]] to native code in one call.
    */
  def extractFeaturesBatched(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one "vectorized" call per batch (stub decodes elementwise)
          batch.map { case (id, mt, payload) =>
            val bytes = if (payload == null) Array.emptyByteArray else payload
            val (checksum, w, h, feat) = decodeStub(bytes)
            val frames = if (mt == "video") 1 + (bytes.length / 64) else 1
            MediaFeatures(id, mt, bytes.length.toLong, checksum, w, h, frames, feat)
          }
        }
      }
  }

  /** Resize plumbing: given extracted features, compute target dims
    * preserving aspect ratio against a max edge, and emit the row a real
    * resampler would fill (payload transform stubbed — the geometry,
    * schema and pass structure are the real part).
    */
  def resizePlan(features: Dataset[MediaFeatures], maxEdge: Int = 256): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxEdge.toDouble) / greatest(col("width"), col("height")))
    features.toDF()
      .filter(col("media_type") === "image")
      .select(col("media_id"), col("width"), col("height"),
        round(col("width") * scale).cast("int").as("target_w"),
        round(col("height") * scale).cast("int").as("target_h"))
  }

  /** Frame sampling plumbing for video-typed rows: emit one row per
    * sampled frame index (every `stride`-th of `n_frames`), payload
    * slicing stubbed as offset bookkeeping.
    */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int = 10): DataFrame = {
    features.toDF()
      .filter(col("media_type") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
  }

  /** Fixture: wrap documents as fake media rows (payload = UTF-8 bytes),
    * so the plumbing is exercised end-to-end on the driver tables.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source").as("meta_source"))
}
