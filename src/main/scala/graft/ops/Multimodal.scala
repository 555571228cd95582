package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side machinery (schema, partitioning, batch iteration,
  * output shape) is real and tested. Container METADATA is decoded for
  * real, dependency-free: image dimensions from PNG/GIF/BMP/JPEG/WebP headers
  * ([[headerDims]]), audio sample rate / channels / duration from WAV
  * RIFF chunks ([[wavMeta]]), video duration and frame count from MP4
  * mvhd + stsz boxes ([[mp4Meta]]). Only pixel/sample-level work
  * (feature vectors, checksums standing in for embeddings) uses a
  * deterministic STUB ([[decodeStub]]) because no codec library ships
  * in this environment — swap the stub for a real decoder (e.g.
  * javacv / TwelveMonkeys) without touching the plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta_source", StringType, nullable = true)))

  /** Feature row produced by the decoder. `width`/`height` are real for
    * PNG/GIF/BMP/JPEG/WebP images (0 for parsed audio/video, stub values
    * otherwise); `sample_rate`/`duration_ms` are real for parsed WAV
    * audio, `duration_ms`/`n_frames` real for parsed MP4 video.
    */
  final case class MediaFeatures(media_id: Long, media_type: String,
      byte_len: Long, checksum: Long, width: Int, height: Int,
      n_frames: Int, sample_rate: Int, duration_ms: Long,
      feature: Array[Float])

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

  /** Real image-header decode: width/height for the five formats whose
    * dimensions are plain header fields, parsed dependency-free.
    *
    *  - PNG: 8-byte signature, then the IHDR chunk — big-endian u32
    *    width/height at payload bytes 16/20 (RFC 2083 s3.1, s4.1.1);
    *  - GIF: "GIF87a"/"GIF89a", then the logical screen descriptor —
    *    little-endian u16 width/height at bytes 6/8 (GIF89a spec s18);
    *  - BMP: "BM" file header, then BITMAPINFOHEADER — little-endian
    *    i32 width/height at bytes 18/22 (height may be negative for
    *    top-down row order; the dimension is its magnitude);
    *  - JPEG: SOI, then a marker walk to the first SOF frame header —
    *    big-endian u16 height/width at segment bytes 3/5 (ITU T.81
    *    B.2.2; markers without a length field are skipped, the walk
    *    stops at SOS/EOI since dims always precede scan data);
    *  - WebP (VP8L lossless): RIFF/WEBP container, "VP8L" chunk,
    *    0x2f signature, then 14-bit width-1 / height-1 packed
    *    little-endian (WebP lossless bitstream spec s3).
    *
    * None for anything else — callers fall back to the stub.
    */
  def headerDims(p: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
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
    else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG marker walk: find the first SOF (C0-CF minus C4/C8/CC)
      var i = 2
      while (i + 1 < p.length) {
        if (u8(i) != 0xff) return None // desynchronized stream
        var j = i + 1
        while (j < p.length && u8(j) == 0xff) j += 1 // fill bytes (T.81 B.1.1.2)
        if (j >= p.length) return None
        val m = u8(j)
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          return if (j + 8 <= p.length) Some((be16(j + 6), be16(j + 4))) else None
        } else if (m == 0xda || m == 0xd9 || m == 0x00) {
          return None // scan data / end / stuffed byte: no frame header
        } else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          i = j + 1 // standalone markers carry no length field
        } else {
          if (j + 3 > p.length) return None
          val len = be16(j + 1)
          if (len < 2) return None
          i = j + 1 + len
        }
      }
      None
    } else if (p.length >= 25 && u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' &&
        u8(3) == 'F' && u8(8) == 'W' && u8(9) == 'E' && u8(10) == 'B' && u8(11) == 'P' &&
        u8(12) == 'V' && u8(13) == 'P' && u8(14) == '8' && u8(15) == 'L' &&
        u8(20) == 0x2f) {
      val bits = le32(21)
      Some(((bits & 0x3fff) + 1, ((bits >> 14) & 0x3fff) + 1))
    } else None
  }

  /** Real BMP PIXEL decode (not just the header): 24bpp uncompressed
    * DIBs only — the one mainstream image format whose pixels need no
    * codec. Returns (width, height, grayscale rows top-down) where
    * gray = (299*R + 587*G + 114*B) / 1000 (integer ITU-R 601 luma —
    * exact when R=G=B since the weights sum to 1000). Handles both
    * bottom-up (positive height, the default) and top-down (negative
    * height) row order, the 4-byte row stride padding, and an
    * arbitrary pixel-data offset from the file header. None for
    * anything that is not a plain 24bpp BI_RGB BMP.
    */
  def bmpGray(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (p.length < 54 || u8(0) != 'B' || u8(1) != 'M') return None
    val pixOff = le32(10)
    val hdrSize = le32(14)
    if (hdrSize < 40) return None // BITMAPCOREHEADER not supported
    val w = le32(18)
    val hRaw = le32(22)
    val h = math.abs(hRaw)
    val bottomUp = hRaw > 0
    if (le16(26) != 1 || le16(28) != 24 || le32(30) != 0) return None // planes/24bpp/BI_RGB
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
    val stride = ((w * 3 + 3) / 4) * 4
    if (pixOff < 0 || pixOff.toLong + stride.toLong * h > p.length) return None
    val gray = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      val rowOff = pixOff + srcRow * stride
      var x = 0
      while (x < w) {
        val b = u8(rowOff + x * 3)
        val g = u8(rowOff + x * 3 + 1)
        val r = u8(rowOff + x * 3 + 2)
        gray(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
        x += 1
      }
      y += 1
    }
    Some((w, h, gray))
  }

  /** Real PNG PIXEL decode — a full dependency-free implementation of
    * the non-interlaced 8-bit path: chunk walk (IHDR/IDAT/IEND with
    * arbitrary ancillary chunks between), zlib inflate of the
    * concatenated IDAT stream via `java.util.zip.Inflater`, and
    * per-scanline UNFILTERING of all five PNG filter types (None /
    * Sub / Up / Average / Paeth — RFC 2083 s6), then the same integer
    * ITU-R 601 luma as [[bmpGray]] for color types 0 (gray),
    * 2 (RGB) and 6 (RGBA; alpha ignored). Returns (w, h, grayscale
    * rows top-down); None for interlaced / 16-bit / palette images or
    * malformed streams.
    */
  def pngGray(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (p.length < 45 || u8(0) != 0x89 || u8(1) != 'P' || u8(2) != 'N' || u8(3) != 'G' ||
        u8(4) != 0x0d || u8(5) != 0x0a || u8(6) != 0x1a || u8(7) != 0x0a) return None
    var i = 8
    var w = 0; var h = 0; var colorType = -1; var sawIhdr = false
    var done = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!done && i + 12 <= p.length) {
      val len = be32(i)
      if (len < 0 || i + 12 + len > p.length) return None
      new String(p, i + 4, 4, "US-ASCII") match {
        case "IHDR" if len >= 13 =>
          w = be32(i + 8); h = be32(i + 12)
          if (u8(i + 16) != 8 || u8(i + 18) != 0 || u8(i + 19) != 0 || u8(i + 20) != 0)
            return None // only depth 8, compression 0, filter 0, no interlace
          colorType = u8(i + 17)
          sawIhdr = true
        case "IDAT" => idat.write(p, i + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      if (!done) i += 12 + len
    }
    if (!sawIhdr || w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14)) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 6 => 4; case _ => return None
    }
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    if (off < raw.length) return None
    val img = new Array[Int](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      var x = 0
      while (x < stride) {
        val cur = raw(y * (stride + 1) + 1 + x) & 0xff
        val a = if (x >= channels) img(y * stride + x - channels) else 0
        val b = if (y > 0) img((y - 1) * stride + x) else 0
        val c = if (x >= channels && y > 0) img((y - 1) * stride + x - channels) else 0
        val v = ft match {
          case 0 => cur
          case 1 => (cur + a) & 0xff
          case 2 => (cur + b) & 0xff
          case 3 => (cur + (a + b) / 2) & 0xff
          case 4 =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            (cur + pred) & 0xff
          case _ => return None
        }
        img(y * stride + x) = v
        x += 1
      }
      y += 1
    }
    val gray = new Array[Int](w * h)
    var j = 0
    while (j < w * h) {
      val base = j * channels
      gray(j) =
        if (channels == 1) img(base)
        else (299 * img(base) + 587 * img(base + 1) + 114 * img(base + 2)) / 1000
      j += 1
    }
    Some((w, h, gray))
  }

  /** 64-bit difference hash (dHash) over a 9x8 grid: bit (cy*8 + cx)
    * is set when cell (cx+1, cy) is brighter than cell (cx, cy) —
    * 8 horizontal gradients per row over 8 rows. Cells are exact
    * integer block means over the [cx*w/9,(cx+1)*w/9) x
    * [cy*h/8,(cy+1)*h/8) tile (truncating division, so any image
    * whose tiles are constant hashes identically to its 9x8
    * downsample — the scale-invariance the spec asserts). Requires
    * w >= 9 && h >= 8.
    */
  def dHash64(gray: Array[Int], w: Int, h: Int): Long = {
    require(w >= 9 && h >= 8, s"dHash needs >= 9x8 pixels, got ${w}x$h")
    val cells = new Array[Long](72)
    var cy = 0
    while (cy < 8) {
      val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
      var cx = 0
      while (cx < 9) {
        val x0 = cx * w / 9; val x1 = (cx + 1) * w / 9
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += gray(y * w + x); x += 1 }
          y += 1
        }
        cells(cy * 9 + cx) = sum / ((y1 - y0).toLong * (x1 - x0))
        cx += 1
      }
      cy += 1
    }
    var hash = 0L
    var bit = 0
    while (bit < 64) {
      val cy = bit / 8; val cx = bit % 8
      if (cells(cy * 9 + cx + 1) > cells(cy * 9 + cx)) hash |= 1L << bit
      bit += 1
    }
    hash
  }

  /** dHash relation over image-typed media rows: (media_id, dhash) for
    * every payload that decodes as a 24bpp BMP, 8-bit PNG, or
    * non-interlaced GIF; non-decodable payloads drop (a production
    * pipeline would route them to a quarantine sink). One pass, no
    * shuffle — the decode stays inside mapPartitions exactly like
    * [[extractFeatures]].
    */
  def dhashRelation(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "image")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          bmpGray(bytes).orElse(pngGray(bytes)).orElse(Gif.gifGray(bytes))
            .map { case (w, h, g) => (id, dHash64(g, w, h)) }
        }
      }
      .toDF("media_id", "dhash")
  }

  /** Real EXIF orientation decode: JPEG marker walk to the APP1
    * segment, "Exif\0\0" signature, then a TIFF IFD0 walk honoring the
    * header's declared byte order ("II" little / "MM" big — the same
    * file format carries both) to the Orientation tag (0x0112, SHORT).
    * Returns the 1..8 orientation, None when absent/malformed.
    * JEITA CP-3451 (EXIF 2.3) s4.6.4, TIFF 6.0 s2.
    */
  def exifOrientation(p: Array[Byte]): Option[Int] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (p.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var i = 2
    while (i + 1 < p.length) {
      if (u8(i) != 0xff) return None
      var j = i + 1
      while (j < p.length && u8(j) == 0xff) j += 1 // fill bytes
      if (j >= p.length) return None
      val m = u8(j)
      if (m == 0xe1 && j + 9 <= p.length &&
          u8(j + 3) == 'E' && u8(j + 4) == 'x' && u8(j + 5) == 'i' &&
          u8(j + 6) == 'f' && u8(j + 7) == 0 && u8(j + 8) == 0) {
        val tiff = j + 9 // TIFF header base; all IFD offsets relative to it
        val segEnd = math.min(p.length, j + 1 + be16(j + 1))
        if (tiff + 8 > segEnd) return None
        val little =
          if (u8(tiff) == 'I' && u8(tiff + 1) == 'I') true
          else if (u8(tiff) == 'M' && u8(tiff + 1) == 'M') false
          else return None
        def r16(k: Int): Int =
          if (little) u8(k) | (u8(k + 1) << 8) else (u8(k) << 8) | u8(k + 1)
        def r32(k: Int): Long =
          if (little) (u8(k) | (u8(k + 1) << 8) | (u8(k + 2) << 16) | (u8(k + 3).toLong << 24))
          else ((u8(k).toLong << 24) | (u8(k + 1) << 16) | (u8(k + 2) << 8) | u8(k + 3))
        if (r16(tiff + 2) != 42) return None
        val ifd0 = tiff + r32(tiff + 4)
        if (ifd0 < tiff || ifd0 + 2 > segEnd) return None
        val n = r16(ifd0.toInt)
        var e = ifd0.toInt + 2
        var left = n
        while (left > 0 && e + 12 <= segEnd) {
          if (r16(e) == 0x0112 && r16(e + 2) == 3) {
            val v = r16(e + 8) // SHORT value lives in the field's first 2 bytes
            return if (v >= 1 && v <= 8) Some(v) else None
          }
          e += 12; left -= 1
        }
        return None
      } else if (m == 0xda || m == 0xd9 || m == 0x00) {
        return None
      } else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        i = j + 1
      } else {
        if (j + 3 > p.length) return None
        val len = be16(j + 1)
        if (len < 2) return None
        i = j + 1 + len
      }
    }
    None
  }

  /** Real WAV metadata: RIFF/WAVE chunk walk reading the `fmt ` chunk
    * (PCM sample rate / channels / bits per sample, little-endian —
    * RIFF spec: each chunk is fourcc + u32 size, bodies 2-byte padded)
    * and the `data` chunk's declared byte length. None unless the RIFF
    * signature and both chunks are present.
    */
  def wavMeta(p: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)) & 0xffffffffL
    def cc(i: Int): String = new String(p, i, 4, "US-ASCII")
    if (p.length < 44 || cc(0) != "RIFF" || cc(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    var dataLen: Option[Long] = None
    while (i + 8 <= p.length && (fmt.isEmpty || dataLen.isEmpty)) {
      val size = le32(i + 4)
      cc(i) match {
        case "fmt " if i + 8 + 16 <= p.length =>
          fmt = Some((le32(i + 12).toInt, le16(i + 10), le16(i + 22)))
        case "data" => dataLen = Some(size)
        case _ => ()
      }
      // chunks are 2-byte aligned; advance in Long — a hostile u32 size
      // (e.g. 0xFFFFFFF8) truncated to Int would advance by 0 (spin) or
      // negative (index crash). adv >= 8 always, and a size pointing
      // past the payload means no further chunk header exists.
      val adv = 8L + size + (size & 1L)
      if (i + adv > p.length) i = p.length else i += adv.toInt
    }
    for ((sr, ch, bits) <- fmt; dl <- dataLen) yield (sr, ch, bits, dl)
  }

  /** Real WAV SAMPLE decode (not just the fmt metadata): the RIFF walk
    * locates the data chunk and the 16-bit PCM samples are read as
    * signed little-endian shorts, all channels interleaved — the one
    * audio format whose samples need no codec. Returns
    * (sampleRate, channels, samples). None unless PCM 16-bit.
    */
  def wavSamples(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)) & 0xffffffffL
    def cc(i: Int): String = new String(p, i, 4, "US-ASCII")
    if (p.length < 44 || cc(0) != "RIFF" || cc(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None // (offset, length)
    while (i + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
      val size = le32(i + 4)
      cc(i) match {
        case "fmt " if i + 8 + 16 <= p.length =>
          fmt = Some((le32(i + 12).toInt, le16(i + 10), le16(i + 22)))
        case "data" =>
          val len = math.min(size, (p.length - i - 8).toLong).toInt
          data = Some((i + 8, len))
        case _ => ()
      }
      val adv = 8L + size + (size & 1L)
      if (i + adv > p.length) i = p.length else i += adv.toInt
    }
    for ((sr, ch, bits) <- fmt; (off, len) <- data; if bits == 16) yield {
      val n = len / 2
      val samples = new Array[Int](n)
      var j = 0
      while (j < n) {
        samples(j) = (le16(off + j * 2) << 16) >> 16 // sign-extend
        j += 1
      }
      (sr, ch, samples)
    }
  }

  /** Sample-level audio statistics over audio-typed media rows — the
    * loudness/silence gates an audio-corpus pipeline runs (drop silent
    * clips, clip-detection via peak, activity via zero crossings).
    * ALL integer: peak = max |s|, mean_square = sum(s²) div n (the
    * RMS decision statistic without the sqrt — monotone equivalent,
    * exactly replayable), zero_crossings counts sign flips with
    * sign(0) pinned positive. One mapPartitions pass, no shuffle.
    */
  def audioStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "audio")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, p) =>
          val bytes = if (p == null) Array.emptyByteArray else p
          wavSamples(bytes).map { case (sr, ch, s) =>
            var peak = 0L; var sumSq = 0L; var zc = 0L
            var j = 0
            while (j < s.length) {
              val v = s(j)
              if (math.abs(v.toLong) > peak) peak = math.abs(v.toLong)
              sumSq += v.toLong * v
              if (j > 0 && ((s(j - 1) < 0) != (v < 0))) zc += 1
              j += 1
            }
            val ms = if (s.length > 0) sumSq / s.length else 0L
            (id, sr.toLong, s.length.toLong, peak, ms, zc)
          }
        }
      }
      .toDF("media_id", "sample_rate", "n_samples", "peak", "mean_square", "zero_crossings")
  }

  /** Integer linear-interpolation PCM resample of a mono sample array
    * from `srcRate` to `dstRate` — the rate-normalization step an
    * audio-corpus pipeline runs before any model sees a clip. ALL
    * integer and convention-pinned so it replays exactly: output
    * position j sits at input time j*src/dst; n_out =
    * (n-1)*dst/src + 1 (the last output lands on or before the last
    * input sample); exact hits copy the sample, interpolated values
    * use FLOOR division (Math.floorDiv == DuckDB's `//`, which
    * truncating `/` would break on negative samples).
    */
  def resamplePcm(s: Array[Int], srcRate: Int, dstRate: Int): Array[Int] = {
    require(srcRate > 0 && dstRate > 0, "rates must be positive")
    if (s.isEmpty) return Array.emptyIntArray
    val nOut = ((s.length - 1).toLong * dstRate / srcRate).toInt + 1
    val out = new Array[Int](nOut)
    var j = 0
    while (j < nOut) {
      val num = j.toLong * srcRate
      val pos = (num / dstRate).toInt
      val frac = num % dstRate
      out(j) =
        if (frac == 0) s(pos)
        else Math.floorDiv(
          s(pos).toLong * (dstRate - frac) + s(pos + 1).toLong * frac,
          dstRate.toLong).toInt
      j += 1
    }
    out
  }

  /** Resampled loudness statistics over audio media rows: decode real
    * 16-bit PCM ([[wavSamples]]), resample to `targetRate`
    * ([[resamplePcm]]), and emit the same integer loudness statistics
    * as [[audioStats]] over the RESAMPLED signal — proving the whole
    * decode→resample chain arithmetically. Mono only (multi-channel
    * rows drop; a production pipeline downmixes first). One
    * mapPartitions pass, no shuffle.
    */
  def resampledAudioStats(media: DataFrame, targetRate: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "audio")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, p) =>
          val bytes = if (p == null) Array.emptyByteArray else p
          wavSamples(bytes).collect { case (sr, 1, s) if s.nonEmpty =>
            val r = resamplePcm(s, sr, targetRate)
            var peak = 0L; var sumSq = 0L; var zc = 0L
            var j = 0
            while (j < r.length) {
              val v = r(j)
              if (math.abs(v.toLong) > peak) peak = math.abs(v.toLong)
              sumSq += v.toLong * v
              if (j > 0 && ((r(j - 1) < 0) != (v < 0))) zc += 1
              j += 1
            }
            (id, sr.toLong, targetRate.toLong, r.length.toLong,
              peak, sumSq / r.length, zc)
          }
        }
      }
      .toDF("media_id", "src_rate", "target_rate", "n_out",
        "peak", "mean_square", "zero_crossings")
  }

  /** Fixture with REAL PCM payloads: mono 16-bit 8 kHz WAVs whose 64
    * samples come from the fmix64 formula
    * ((fmix64(doc_id * 1000003 + i) & 0xffff) - 32768), so every
    * statistic replays arithmetically from doc_id in HUGEINT.
    */
  def pcmWavMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, src) =>
        val n = 64
        val bb = java.nio.ByteBuffer.allocate(n * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) {
          val s = ((graft.functions.Hashing.fmix64(id * 1000003L + i) & 0xffffL) - 32768L).toInt
          bb.putShort(s.toShort)
          i += 1
        }
        (id, "audio", wavHeader(8000, 1, 16, n * 2) ++ bb.array(), src)
      }
      .toDF("media_id", "media_type", "payload", "meta_source")
  }

  /** Real MP4 metadata: ISO BMFF box walk (u32 BE size + fourcc,
    * containers recursed) reading `mvhd` (movie timescale + duration,
    * v0 u32 / v1 u64 fields) and a track's `stsz` sample count — the
    * container field that IS the frame count. In a multi-track file the
    * frame count comes from the first trak whose `hdlr` handler is
    * `vide` (the video track), so an audio trak listed first cannot
    * misreport its sample count as frames; a file with no `vide` hdlr
    * anywhere (minimal single-track prefixes like [[mp4Header]]'s) falls
    * back to the first trak carrying an stsz. None unless mvhd and a
    * frame count are both found. ISO/IEC 14496-12 s8.2.2 (mvhd),
    * s8.4.3 (hdlr), s8.7.3 (stsz).
    */
  def mp4Meta(p: Array[Byte]): Option[(Int, Long, Int)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def cc(i: Int): String = new String(p, i, 4, "US-ASCII")
    val containers = Set("moov", "mdia", "minf", "stbl")
    var mvhd: Option[(Int, Long)] = None
    // traks in file order: (hdlr handler fourcc if present, stsz count)
    val traks = scala.collection.mutable.ArrayBuffer.empty[(Option[String], Option[Int])]
    var curHandler: Option[String] = None
    var curStsz: Option[Int] = None
    def walk(start: Int, end: Int, inTrak: Boolean): Unit = {
      var i = start
      while (i + 8 <= end) {
        val size = be32(i)
        if (size < 8 || i + size > end) return // tolerant: stop at junk
        cc(i + 4) match {
          case "mvhd" if i + 32 <= end =>
            val v = u8(i + 8)
            mvhd =
              if (v == 0) Some((be32(i + 20).toInt, be32(i + 24)))
              else if (v == 1 && i + 44 <= end) Some((be32(i + 28).toInt, be64(i + 32)))
              else mvhd
          case "hdlr" if inTrak && i + 20 <= end =>
            if (curHandler.isEmpty) curHandler = Some(cc(i + 16))
          case "stsz" if inTrak && i + 20 <= end =>
            if (curStsz.isEmpty) curStsz = Some(be32(i + 16).toInt)
          case "trak" =>
            curHandler = None; curStsz = None
            walk(i + 8, i + size.toInt, inTrak = true)
            traks += ((curHandler, curStsz))
          case t if containers(t) => walk(i + 8, i + size.toInt, inTrak)
          case _ => ()
        }
        i += size.toInt
      }
    }
    if (p.length >= 8) walk(0, p.length, inTrak = false)
    val frames = traks.collectFirst { case (Some("vide"), Some(n)) => n }
      .orElse(traks.collectFirst { case (_, Some(n)) => n })
    for ((ts, dur) <- mvhd; f <- frames)
      yield (ts, dur, f)
  }

  /** Real MP4 frame-extraction bookkeeping: the per-sample SIZE table
    * (stsz with sample_size = 0) and the first chunk offset (stco)
    * are the container fields that locate each frame's bytes — frame
    * i occupies [stco[0] + Σ sizes[<i], + sizes[i]). Returns the
    * (offset, length) table; None unless both boxes parse.
    * ISO/IEC 14496-12 s8.7.3 (stsz), s8.7.5 (stco).
    */
  def mp4FrameOffsets(p: Array[Byte]): Option[Array[(Long, Long)]] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be32(i: Int): Long = ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def cc(i: Int): String = new String(p, i, 4, "US-ASCII")
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    var sizes: Option[Array[Long]] = None
    var chunkOff: Option[Long] = None
    def walk(start: Int, end: Int): Unit = {
      var i = start
      while (i + 8 <= end) {
        val size = be32(i)
        if (size < 8 || i + size > end) return
        cc(i + 4) match {
          case "stsz" if i + 20 <= end =>
            val fixed = be32(i + 12)
            val n = be32(i + 16).toInt
            if (sizes.isEmpty && fixed == 0 && n >= 0 && i + 20 + 4L * n <= end)
              sizes = Some(Array.tabulate(n)(k => be32(i + 20 + 4 * k)))
          case "stco" if i + 16 <= end =>
            val n = be32(i + 12).toInt
            if (chunkOff.isEmpty && n >= 1 && i + 16 + 4L * n <= end)
              chunkOff = Some(be32(i + 16))
          case t if containers(t) => walk(i + 8, i + size.toInt)
          case _ => ()
        }
        i += size.toInt
      }
    }
    if (p.length >= 8) walk(0, p.length)
    for (sz <- sizes; off <- chunkOff) yield {
      val out = new Array[(Long, Long)](sz.length)
      var acc = off
      var k = 0
      while (k < sz.length) { out(k) = (acc, sz(k)); acc += sz(k); k += 1 }
      out
    }
  }

  /** Per-frame byte ranges for video media rows — the real-offset form
    * of [[sampleFrames]]: one row per frame with its mdat byte range
    * read from the actual stsz/stco tables. One pass, no shuffle.
    */
  def frameOffsetTable(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "video")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val bytes = if (p == null) Array.emptyByteArray else p
        mp4FrameOffsets(bytes).toSeq.flatMap(_.iterator.zipWithIndex.map {
          case ((off, len), idx) => (id, idx.toLong, off, len)
        })
      }
      .toDF("media_id", "frame_idx", "byte_off", "byte_len")
  }

  /** MP4 fixture WITH a real per-sample size table: like [[mp4Header]]
    * but stsz carries `sizes` explicitly (sample_size = 0) and an stco
    * box records the mdat payload offset, so [[mp4FrameOffsets]] reads
    * genuine container fields. Box math: stbl = stsz(20 + 4n) +
    * stco(20); moov = mvhd(108) + trak chain; mdat payload begins at
    * 16 + moovSize + 8.
    */
  private[graft] def mp4HeaderWithSizes(timescale: Int, durationTs: Long,
      sizes: Array[Int]): Array[Byte] = {
    val n = sizes.length
    val stszSize = 20 + 4 * n
    val stcoSize = 20
    val stblSize = 8 + stszSize + stcoSize
    val minfSize = 8 + stblSize
    val mdiaSize = 8 + minfSize
    val trakSize = 8 + mdiaSize
    val moovSize = 8 + 108 + trakSize
    val mdatPayloadOff = 16 + moovSize + 8
    val dataLen = sizes.map(_.toLong).sum.toInt
    val bb = java.nio.ByteBuffer.allocate(16 + moovSize + 8)
    bb.put(Array[Byte](0, 0, 0, 16)).put("ftyp".getBytes("US-ASCII"))
    bb.put("isom".getBytes("US-ASCII")).putInt(0)
    bb.putInt(moovSize).put("moov".getBytes("US-ASCII"))
    bb.putInt(108).put("mvhd".getBytes("US-ASCII"))
    bb.putInt(0)
    bb.putInt(0).putInt(0)
    bb.putInt(timescale).putInt(durationTs.toInt)
    bb.putInt(0x00010000)
    bb.putShort(0x0100.toShort)
    bb.position(bb.position() + 10)
    bb.putInt(0x00010000).putInt(0).putInt(0)
    bb.putInt(0).putInt(0x00010000).putInt(0)
    bb.putInt(0).putInt(0).putInt(0x40000000)
    bb.position(bb.position() + 24)
    bb.putInt(2)
    bb.putInt(trakSize).put("trak".getBytes("US-ASCII"))
    bb.putInt(mdiaSize).put("mdia".getBytes("US-ASCII"))
    bb.putInt(minfSize).put("minf".getBytes("US-ASCII"))
    bb.putInt(stblSize).put("stbl".getBytes("US-ASCII"))
    bb.putInt(stszSize).put("stsz".getBytes("US-ASCII"))
    bb.putInt(0)        // version + flags
    bb.putInt(0)        // sample_size 0 -> per-sample table follows
    bb.putInt(n)
    sizes.foreach(bb.putInt)
    bb.putInt(stcoSize).put("stco".getBytes("US-ASCII"))
    bb.putInt(0)        // version + flags
    bb.putInt(1)        // entry_count
    bb.putInt(mdatPayloadOff)
    bb.putInt(8 + dataLen).put("mdat".getBytes("US-ASCII"))
    bb.array()
  }

  /** Fixture: one MP4 per doc with 1 + doc_id % 20 frames whose sizes
    * come from 100 + (fmix64(doc_id * 31 + i) & 255) — every byte
    * range replays arithmetically from doc_id.
    */
  def mp4FrameMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, src) =>
        val n = 1 + (id % 20).toInt
        val sizes = Array.tabulate(n)(i =>
          100 + (graft.functions.Hashing.fmix64(id * 31L + i) & 255L).toInt)
        (id, "video", mp4HeaderWithSizes(1000, (1 + id % 60) * 1000, sizes), src)
      }
      .toDF("media_id", "media_type", "payload", "meta_source")
  }

  /** Decode dispatch: image-typed rows get real header dims when the
    * payload is PNG/GIF/BMP/JPEG/WebP; audio rows get real sample rate + duration
    * when the payload is WAV (dims 0 — meaningless for audio); video
    * rows get real frame count + duration when the payload is MP4
    * (dims 0 — no tkhd in the minimal walk). Unparsed payloads keep the
    * stub's synthetic values. The checksum and feature vector always
    * come from the full-payload stub pass.
    * Returns (checksum, w, h, nFrames, sampleRate, durationMs, feature).
    */
  private def decode(mediaType: String, bytes: Array[Byte]): (Long, Int, Int, Int, Int, Long, Array[Float]) = {
    val (checksum, sw, sh, feat) = decodeStub(bytes)
    mediaType match {
      case "image" =>
        val (w, h) = headerDims(bytes).getOrElse((sw, sh))
        (checksum, w, h, 1, 0, 0L, feat)
      case "audio" => wavMeta(bytes) match {
        case Some((sr, ch, bits, dataLen)) =>
          val byteRate = sr.toLong * ch * (bits / 8)
          val durMs = if (byteRate > 0) dataLen * 1000L / byteRate else 0L
          (checksum, 0, 0, 1, sr, durMs, feat)
        case None => (checksum, sw, sh, 1, 0, 0L, feat)
      }
      case "video" => mp4Meta(bytes) match {
        case Some((ts, dur, nFrames)) =>
          val durMs = if (ts > 0) dur * 1000L / ts else 0L
          (checksum, 0, 0, nFrames, 0, durMs, feat)
        case None =>
          (checksum, sw, sh, 1 + bytes.length / 64, 0, 0L, feat)
      }
      case _ => (checksum, sw, sh, 1, 0, 0L, feat)
    }
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
          val (checksum, w, h, frames, sr, durMs, feat) = decode(mt, bytes)
          MediaFeatures(id, mt, bytes.length.toLong, checksum, w, h, frames, sr, durMs, feat)
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
            val (checksum, w, h, frames, sr, durMs, feat) = decode(mt, bytes)
            MediaFeatures(id, mt, bytes.length.toLong, checksum, w, h, frames, sr, durMs, feat)
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

  /** COMPLETE 24bpp bottom-up BMP (not just a header): 54-byte headers
    * plus padded pixel rows, R=G=B=gray so the ITU-R 601 luma in
    * [[bmpGray]] recovers the written value exactly (the weights sum
    * to 1000). `gray` is row-major top-down; rows are written
    * bottom-up with the 4-byte stride padding, so the decode walk is
    * exercised for real.
    */
  private[graft] def bmpPixelBytes(w: Int, h: Int, gray: Array[Int]): Array[Byte] = {
    require(gray.length == w * h, s"expected ${w * h} pixels, got ${gray.length}")
    val stride = ((w * 3 + 3) / 4) * 4
    val bb = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(54 + stride * h)
    bb.putInt(0)
    bb.putInt(54)
    bb.putInt(40)
    bb.putInt(w).putInt(h) // positive height: bottom-up row order
    bb.putShort(1)
    bb.putShort(24)
    bb.putInt(0)                    // BI_RGB
    bb.putInt(stride * h)           // image size
    bb.putInt(2835).putInt(2835)    // 72 DPI
    bb.putInt(0).putInt(0)          // palette fields
    var y = h - 1                   // file rows bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = (gray(y * w + x) & 0xff).toByte
        bb.put(v).put(v).put(v)     // B, G, R
        x += 1
      }
      var pad = stride - w * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      y -= 1
    }
    bb.array()
  }

  /** COMPLETE 8-bit grayscale PNG with real zlib-compressed pixel
    * data and the scanline filter ROTATING through all five types
    * (row y uses filter y % 5, with the filtered bytes computed per
    * RFC 2083 s6), so [[pngGray]]'s Sub/Up/Average/Paeth unfiltering
    * is exercised for real — a filter-0-only fixture would leave four
    * of the five reconstruction paths untested.
    */
  private[graft] def pngPixelBytes(w: Int, h: Int, gray: Array[Int]): Array[Byte] = {
    require(gray.length == w * h, s"expected ${w * h} pixels, got ${gray.length}")
    val stride = w
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = gray(y * stride + x)
        val a = if (x >= 1) gray(y * stride + x - 1) else 0
        val b = if (y > 0) gray((y - 1) * stride + x) else 0
        val c = if (x >= 1 && y > 0) gray((y - 1) * stride + x - 1) else 0
        val f = ft match {
          case 0 => cur
          case 1 => (cur - a) & 0xff
          case 2 => (cur - b) & 0xff
          case 3 => (cur - (a + b) / 2) & 0xff
          case _ =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            (cur - pred) & 0xff
        }
        raw(y * (stride + 1) + 1 + x) = f.toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(0.toByte) // depth 8, color type 0 (gray)
      .put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zbuf.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** PNG twin of [[bmpPixelMedia]]: SAME [[cellGray]] pixel formula,
    * different container — real deflate + all five scanline filters —
    * so the n94 oracle replay certifies BOTH byte-level decoders.
    */
  def pngPixelMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, src) =>
        val gray = Array.tabulate(72)(cell => cellGray(id / 4, (id % 4).toInt, cell))
        (id, "image", pngPixelBytes(9, 8, gray), src)
      }
      .toDF("media_id", "media_type", "payload", "meta_source")
  }

  /** Fixture pixel formula for [[bmpPixelMedia]]: docs in the same
    * group (doc_id / 4) share a pseudo-random base pattern
    * fmix64(group * 73 + cell + 1234567) & 0xff; members 1..3 invert
    * ONE cell each — cell (group + member * 13) % 72 — so a member's
    * dHash differs from the base in at most 2 bits (the inverted cell
    * touches only its left and right gradient comparisons). Every
    * quantity replays in SQL from doc_id alone, which is what lets the
    * oracle verify the real byte-level decode arithmetically.
    */
  private[graft] def cellGray(group: Long, member: Int, cell: Int): Int = {
    val base = (graft.functions.Hashing.fmix64(group * 73L + cell + 1234567L) & 0xffL).toInt
    if (member > 0 && cell == ((group + member * 13L) % 72L).toInt) 255 - base else base
  }

  /** Fixture with REAL pixel data: one 9x8 24bpp BMP per document,
    * grayscale values from [[cellGray]] over group = doc_id / 4 and
    * member = doc_id % 4 — planted so each group of four images is a
    * near-duplicate cluster at Hamming distance <= 2 from its base
    * while distinct groups are ~32 bits apart. Exercises the full
    * bottom-up/stride/BGR decode in [[bmpGray]] end-to-end.
    */
  def bmpPixelMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, src) =>
        val group = id / 4
        val member = (id % 4).toInt
        val gray = Array.tabulate(72)(cell => cellGray(group, member, cell))
        (id, "image", bmpPixelBytes(9, 8, gray), src)
      }
      .toDF("media_id", "media_type", "payload", "meta_source")
  }

  /** SOI + baseline SOF0 frame header (8-bit, 3 components, 4:4:4).
    * 21 bytes; dims are u16 (ITU T.81 caps JPEG at 65535).
    */
  private[graft] def jpegHeader(w: Int, h: Int): Array[Byte] = {
    require(w <= 65535 && h <= 65535, "JPEG dims are u16")
    val bb = java.nio.ByteBuffer.allocate(21) // big-endian by default
    bb.putShort(0xffd8.toShort) // SOI
    bb.putShort(0xffc0.toShort) // SOF0
    bb.putShort(17)             // segment length: 8 + 3 components x 3
    bb.put(8.toByte)            // sample precision
    bb.putShort((h & 0xffff).toShort).putShort((w & 0xffff).toShort)
    bb.put(3.toByte)            // component count
    for (c <- 1 to 3) // id, 1x1 sampling, quant table (0 luma / 1 chroma)
      bb.put(c.toByte).put(0x11.toByte).put((if (c == 1) 0 else 1).toByte)
    bb.array()
  }

  /** RIFF/WEBP container with a VP8L (lossless) chunk: 0x2f signature
    * then 14-bit width-1 / height-1 packed little-endian. 25 bytes;
    * dims cap at 16384 (the 14-bit field).
    */
  private[graft] def webpHeader(w: Int, h: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 16384 && h <= 16384, "VP8L dims are 14-bit")
    val bb = java.nio.ByteBuffer.allocate(25).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(17) // "WEBP" + chunk hdr + 5 payload
    bb.put("WEBP".getBytes("US-ASCII"))
    bb.put("VP8L".getBytes("US-ASCII")).putInt(5)
    bb.put(0x2f.toByte)
    val bits = ((w - 1).toLong & 0x3fff) | (((h - 1).toLong & 0x3fff) << 14)
    bb.put((bits & 0xff).toByte).put(((bits >> 8) & 0xff).toByte)
      .put(((bits >> 16) & 0xff).toByte).put(((bits >> 24) & 0xff).toByte)
    bb.array()
  }

  /** Real APP1/EXIF segment (34 bytes): FFE1 marker, segment length,
    * "Exif\0\0", then a TIFF header + one-entry IFD0 carrying the
    * Orientation tag — in EITHER byte order, so the decoder's "II"/"MM"
    * dispatch is exercised for real.
    */
  private[graft] def exifApp1(orientation: Int, littleEndian: Boolean): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, "EXIF orientation is 1..8")
    val bb = java.nio.ByteBuffer.allocate(36) // big-endian for marker/len
    bb.putShort(0xffe1.toShort)
    bb.putShort(34) // segment length (everything after the marker)
    bb.put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
    if (littleEndian) {
      bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putShort(0x4949.toShort) // "II"
    } else bb.putShort(0x4d4d.toShort) // "MM"
    bb.putShort(42)
    bb.putInt(8) // IFD0 offset from TIFF base
    bb.putShort(1) // entry count
    bb.putShort(0x0112.toShort) // Orientation
    bb.putShort(3) // SHORT
    bb.putInt(1) // count
    bb.putShort(orientation.toShort).putShort(0) // value + pad
    bb.putInt(0) // next IFD
    bb.array()
  }

  /** Fixture with REAL EXIF metadata: every doc becomes a JPEG whose
    * SOI is followed by a genuine APP1/TIFF segment (byte order
    * alternating by doc parity) with orientation = 1 + doc_id % 8 and
    * the n13 dimension formulas in the SOF0 header — the decoder must
    * walk PAST the APP1 for dims and INTO it for orientation.
    */
  def exifJpegMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, src) =>
        val w = 16 + (id % 1000).toInt
        val h = 16 + ((id / 7) % 1000).toInt
        val jpeg = jpegHeader(w, h)
        val payload = jpeg.take(2) ++
          exifApp1(1 + (id % 8).toInt, littleEndian = id % 2 == 0) ++ jpeg.drop(2)
        (id, "image", payload, src)
      }
      .toDF("media_id", "media_type", "payload", "meta_source")
  }

  /** Orientation-aware image features over image media rows: real EXIF
    * orientation + real header dims per payload, with the
    * display-space dimensions (orientations 5..8 transpose). One
    * mapPartitions pass, rows without both fields drop.
    */
  def exifFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "image")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, p) =>
          val bytes = if (p == null) Array.emptyByteArray else p
          for (o <- exifOrientation(bytes); wh <- headerDims(bytes))
            yield (id, o.toLong, wh._1.toLong, wh._2.toLong)
        }
      }
      .toDF("media_id", "orientation", "width", "height")
      .withColumn("display_w",
        when(col("orientation") >= 5, col("height")).otherwise(col("width")))
      .withColumn("display_h",
        when(col("orientation") >= 5, col("width")).otherwise(col("height")))
  }

  /** Canonical 44-byte PCM WAV header (RIFF + fmt + data chunk header);
    * the caller appends `dataLen` bytes of sample data.
    */
  private[graft] def wavHeader(sampleRate: Int, channels: Int, bits: Int,
      dataLen: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels * (bits / 8)) // byte rate
    bb.putShort((channels * (bits / 8)).toShort)  // block align
    bb.putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  /** Minimal ISO BMFF prefix: ftyp(16) + moov(168: mvhd 108 + trak 52
    * with the stbl/stsz chain) + the mdat box header (8) — 192 bytes;
    * the caller appends `dataLen` bytes of mdat payload. All fields the
    * [[mp4Meta]] walk reads (mvhd v0 timescale/duration, stsz
    * sample_count) are set for real.
    */
  private[graft] def mp4Header(timescale: Int, durationTs: Long,
      nFrames: Int, dataLen: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(192) // big-endian by default
    bb.put(Array[Byte](0, 0, 0, 16)).put("ftyp".getBytes("US-ASCII"))
    bb.put("isom".getBytes("US-ASCII")).putInt(0)
    bb.putInt(168).put("moov".getBytes("US-ASCII"))
    bb.putInt(108).put("mvhd".getBytes("US-ASCII"))
    bb.putInt(0)                 // version 0 + flags
    bb.putInt(0).putInt(0)       // creation, modification
    bb.putInt(timescale).putInt(durationTs.toInt)
    bb.putInt(0x00010000)        // rate 1.0
    bb.putShort(0x0100.toShort)  // volume 1.0
    bb.position(bb.position() + 10) // reserved
    bb.putInt(0x00010000).putInt(0).putInt(0) // unity matrix
    bb.putInt(0).putInt(0x00010000).putInt(0)
    bb.putInt(0).putInt(0).putInt(0x40000000)
    bb.position(bb.position() + 24) // pre_defined
    bb.putInt(2)                 // next_track_ID
    bb.putInt(52).put("trak".getBytes("US-ASCII"))
    bb.putInt(44).put("mdia".getBytes("US-ASCII"))
    bb.putInt(36).put("minf".getBytes("US-ASCII"))
    bb.putInt(28).put("stbl".getBytes("US-ASCII"))
    bb.putInt(20).put("stsz".getBytes("US-ASCII"))
    bb.putInt(0)                 // version + flags
    bb.putInt(0)                 // sample_size 0 = per-sample table
    bb.putInt(nFrames)           // sample_count == frame count
    bb.putInt(8 + dataLen).put("mdat".getBytes("US-ASCII"))
    bb.array()
  }

  /** Fixture with REAL image bytes: image-typed rows (doc_id % 3 == 0)
    * carry a genuine PNG/GIF/BMP/JPEG/WebP header — format rotating by
    * (doc_id / 3) % 5, PNG with a correct IHDR CRC — whose encoded
    * dimensions are w = 16 + doc_id % 1000, h = 16 + (doc_id / 7) % 1000,
    * followed by the UTF-8 text. Audio rows carry a real 44-byte WAV
    * header (sample_rate = 8000 + (doc_id % 8) * 1000, channels =
    * 1 + (doc_id / 3) % 2, 16-bit, data = the UTF-8 text). Video rows
    * carry a real 192-byte MP4 prefix (timescale 1000, duration =
    * (1 + doc_id % 60) * 1000, stsz sample_count = 1 + doc_id % 300,
    * mdat = the text). Exercises [[headerDims]]/[[wavMeta]]/[[mp4Meta]]
    * end-to-end with every field an oracle can recompute arithmetically
    * from doc_id.
    */
  def mediaWithHeaders(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, src) =>
        val textBytes = text.getBytes("UTF-8")
        val mt = id % 3 match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
        val payload = mt match {
          case "image" =>
            val w = 16 + (id % 1000).toInt
            val h = 16 + ((id / 7) % 1000).toInt
            val header = (id / 3) % 5 match {
              case 0 => pngHeader(w, h)
              case 1 => gifHeader(w, h)
              case 2 => bmpHeader(w, h)
              case 3 => jpegHeader(w, h)
              case _ => webpHeader(w, h)
            }
            header ++ textBytes
          case "audio" =>
            wavHeader(8000 + (id % 8).toInt * 1000, 1 + ((id / 3) % 2).toInt,
              16, textBytes.length) ++ textBytes
          case _ =>
            mp4Header(1000, (1 + id % 60) * 1000, 1 + (id % 300).toInt,
              textBytes.length) ++ textBytes
        }
        (id, mt, payload, src)
      }
      .toDF("media_id", "media_type", "payload", "meta_source")
  }
}
