package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side machinery (schema, partitioning, batch iteration,
  * output shape) is real and tested. Image DIMENSIONS are decoded for
  * real from PNG/GIF/BMP headers ([[headerDims]] — plain header fields,
  * dependency-free JVM parsing); payloads in other formats, and the
  * audio/video branches plus pixel-level feature extraction, fall back
  * to a deterministic STUB ([[decodeStub]]) because no full codec
  * library ships in this environment — swap the stub for a real decoder
  * (e.g. javacv / TwelveMonkeys) without touching the plumbing.
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

  /** Real image-header decode: width/height for the three formats whose
    * dimensions are plain header fields, parsed dependency-free.
    *
    *  - PNG: 8-byte signature, then the IHDR chunk — big-endian u32
    *    width/height at payload bytes 16/20 (RFC 2083 s3.1, s4.1.1);
    *  - GIF: "GIF87a"/"GIF89a", then the logical screen descriptor —
    *    little-endian u16 width/height at bytes 6/8 (GIF89a spec s18);
    *  - BMP: "BM" file header, then BITMAPINFOHEADER — little-endian
    *    i32 width/height at bytes 18/22 (height may be negative for
    *    top-down row order; the dimension is its magnitude).
    *
    * None for anything else — callers fall back to the stub.
    */
  def headerDims(p: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (p.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')
      Some((be32(16), be32(20)))
    else if (p.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
        u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      Some((le16(6), le16(8)))
    else if (p.length >= 26 && u8(0) == 'B' && u8(1) == 'M')
      Some((le32(18), math.abs(le32(22))))
    else None
  }

  /** Decode dispatch: image-typed rows get real header dims when the
    * payload is PNG/GIF/BMP (other image formats, and all audio/video,
    * keep the stub's synthetic dims); the checksum and feature vector
    * always come from the full-payload stub pass.
    */
  private def decode(mediaType: String, bytes: Array[Byte]): (Long, Int, Int, Array[Float]) = {
    val (checksum, sw, sh, feat) = decodeStub(bytes)
    val (w, h) =
      if (mediaType == "image") headerDims(bytes).getOrElse((sw, sh)) else (sw, sh)
    (checksum, w, h, feat)
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
          val (checksum, w, h, feat) = decode(mt, bytes)
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
          // one "vectorized" call per batch (decode runs elementwise)
          batch.map { case (id, mt, payload) =>
            val bytes = if (payload == null) Array.emptyByteArray else payload
            val (checksum, w, h, feat) = decode(mt, bytes)
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

  /** Minimal valid PNG prefix: signature + IHDR chunk with a correct
    * CRC32 (8-bit RGBA, no interlace). 33 bytes.
    */
  private[graft] def pngHeader(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33) // big-endian by default
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13) // IHDR data length
    val ihdrStart = bb.position()
    bb.put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w).putInt(h)
    bb.put(8.toByte).put(6.toByte) // bit depth, color type RGBA
    bb.put(0.toByte).put(0.toByte).put(0.toByte) // compression, filter, interlace
    val crc = new java.util.zip.CRC32()
    crc.update(bb.array(), ihdrStart, 17) // type + data
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** GIF89a header + logical screen descriptor. 13 bytes. */
  private[graft] def gifHeader(w: Int, h: Int): Array[Byte] = {
    val b = new Array[Byte](13)
    "GIF89a".getBytes("US-ASCII").copyToArray(b)
    b(6) = (w & 0xff).toByte; b(7) = ((w >> 8) & 0xff).toByte
    b(8) = (h & 0xff).toByte; b(9) = ((h >> 8) & 0xff).toByte
    b(10) = 0x70.toByte // packed: no global color table, 8-bit color res
    b
  }

  /** BMP file header + full 40-byte BITMAPINFOHEADER (24bpp). 54 bytes. */
  private[graft] def bmpHeader(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54)      // file size (header-only; fixture appends payload)
    bb.putInt(0)       // reserved
    bb.putInt(54)      // pixel data offset
    bb.putInt(40)      // BITMAPINFOHEADER size
    bb.putInt(w).putInt(h)
    bb.putShort(1)     // planes
    bb.putShort(24)    // bits per pixel; remaining 24 bytes stay zero
    bb.array()
  }

  /** Fixture with REAL image bytes: image-typed rows (doc_id % 3 == 0)
    * carry a genuine PNG/GIF/BMP header — format rotating by
    * (doc_id / 3) % 3, PNG with a correct IHDR CRC — whose encoded
    * dimensions are w = 16 + doc_id % 1000, h = 16 + (doc_id / 7) % 1000,
    * followed by the UTF-8 text. Audio/video rows keep the bare text
    * payload. Exercises [[headerDims]] end-to-end with dimensions an
    * oracle can recompute arithmetically from doc_id.
    */
  def mediaWithHeaders(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, src) =>
        val textBytes = text.getBytes("UTF-8")
        val mt = id % 3 match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
        val payload =
          if (mt == "image") {
            val w = 16 + (id % 1000).toInt
            val h = 16 + ((id / 7) % 1000).toInt
            val header = (id / 3) % 3 match {
              case 0 => pngHeader(w, h)
              case 1 => gifHeader(w, h)
              case _ => bmpHeader(w, h)
            }
            header ++ textBytes
          } else textBytes
        (id, mt, payload, src)
      }
      .toDF("media_id", "media_type", "payload", "meta_source")
  }
}
