package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Real GIF PIXEL codec — the third dependency-free byte-level image
  * decoder after BMP ([[Multimodal.bmpGray]]) and PNG
  * ([[Multimodal.pngGray]]): full LZW decompression (variable code
  * width 3..12 bits, CLEAR/EOI handling, the KwKwK self-reference
  * case, dictionary-full freeze) over the sub-block-framed image data,
  * palette lookup through the global or local color table, and the
  * same integer ITU-R 601 luma as the other two decoders.
  *
  * The matching ENCODER ([[gifPixelBytes]]) emits genuine
  * dictionary-built LZW (not a literal-only stream), so the decoder's
  * growth path is exercised for real; the spec additionally
  * round-trips both directions against `javax.imageio`'s independent
  * GIF implementation on noise images large enough to drive the code
  * width through 10/11/12 bits and into the dictionary-full regime —
  * pinning the early-change width-growth convention against a
  * reference codec rather than asserting self-consistency only.
  *
  * GIF89a spec: header/LSD s17-18, image descriptor s20, table-based
  * image data + LZW s22 and appendix F.
  */
object Gif {

  /** LZW bit reader: GIF packs codes least-significant-bit first. */
  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var bitBuf = 0
    private var bitCnt = 0
    /** Next `width`-bit code, or -1 on exhausted input. */
    def read(width: Int): Int = {
      while (bitCnt < width) {
        if (pos >= data.length) return -1
        bitBuf |= (data(pos) & 0xff) << bitCnt
        bitCnt += 8
        pos += 1
      }
      val v = bitBuf & ((1 << width) - 1)
      bitBuf >>>= width
      bitCnt -= width
      v
    }
  }

  /** LZW bit writer, LSB-first, mirroring [[BitReader]]. */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var bitBuf = 0
    private var bitCnt = 0
    def write(code: Int, width: Int): Unit = {
      bitBuf |= code << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        out.write(bitBuf & 0xff)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (bitCnt > 0) { out.write(bitBuf & 0xff); bitBuf = 0; bitCnt = 0 }
      out.toByteArray
    }
  }

  /** Decode a GIF LZW stream (already de-framed from its sub-blocks)
    * into `expected` palette indices. None on any malformed input.
    */
  private[ops] def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outPos = 0
    // dictionary: prefix code + appended byte per entry; literals implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    val br = new BitReader(data)
    var codeSize = minCodeSize + 1
    var next = eoi + 1
    var prev = -1
    // expand one code onto the output via an explicit stack walk
    val stack = new Array[Byte](4096)
    def firstByte(code: Int): Int = {
      var c = code
      while (c >= clear + 2) c = prefix(c)
      c
    }
    def emit(code: Int): Boolean = {
      var sp = 0
      var c = code
      while (c >= clear + 2) {
        if (sp >= stack.length) return false // corrupt chain
        stack(sp) = append(c); sp += 1; c = prefix(c)
      }
      if (outPos + sp + 1 > expected) return false
      out(outPos) = c.toByte; outPos += 1
      while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
      true
    }
    var done = false
    while (!done && outPos < expected) {
      val c = br.read(codeSize)
      if (c < 0) return None
      if (c == clear) {
        codeSize = minCodeSize + 1; next = eoi + 1; prev = -1
      } else if (c == eoi) {
        done = true
      } else if (prev == -1) {
        if (c >= clear) return None // first code must be a literal
        if (!emit(c)) return None
        prev = c
      } else {
        if (c > next || (c < next && c >= clear && c < clear + 2)) return None
        if (c == next) {
          // KwKwK: the code being defined right now
          if (next >= 4096) return None
          prefix(next) = prev; append(next) = firstByte(prev).toByte
          next += 1
          if (!emit(c)) return None
        } else {
          if (!emit(c)) return None
          if (next < 4096) {
            prefix(next) = prev; append(next) = firstByte(c).toByte
            next += 1
          }
        }
        // width growth AFTER the table add — pinned against
        // javax.imageio round-trips in GifCodecSpec
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = c
      }
    }
    if (outPos == expected) Some(out) else None
  }

  /** Encode palette indices as a GIF LZW stream (un-framed; the caller
    * wraps it in sub-blocks). Emits CLEAR up front, builds the
    * dictionary greedily, resets on dictionary-full, and terminates
    * with EOI — the exact mirror of [[lzwDecode]]'s growth timing.
    */
  private[ops] def lzwEncode(pixels: Array[Byte], minCodeSize: Int): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8, s"bad min code size $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bw = new BitWriter()
    var codeSize = minCodeSize + 1
    var next = eoi + 1
    // (prefix code, byte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    def key(p: Int, k: Int): Integer = Integer.valueOf((p << 8) | k)
    bw.write(clear, codeSize)
    if (pixels.nonEmpty) {
      var w = pixels(0) & 0xff
      var i = 1
      while (i < pixels.length) {
        val k = pixels(i) & 0xff
        val ext = dict.get(key(w, k))
        if (ext != null) {
          w = ext.intValue()
        } else {
          bw.write(w, codeSize)
          if (next < 4096) {
            dict.put(key(w, k), Integer.valueOf(next))
            next += 1
            // decoder adds its twin entry one code later, so its
            // counter trails by one: widen when next passes 2^cs
            if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          } else {
            // dictionary full: reset so the stream never relies on the
            // frozen-dictionary regime (the decoder still supports it
            // for foreign streams)
            bw.write(clear, codeSize)
            codeSize = minCodeSize + 1
            next = eoi + 1
            dict = new java.util.HashMap[Integer, Integer]()
          }
          w = k
        }
        i += 1
      }
      bw.write(w, codeSize)
    }
    bw.write(eoi, codeSize)
    bw.finish()
  }

  /** Real GIF PIXEL decode: header + logical screen descriptor, global
    * color table, extension-block skip, first image descriptor (local
    * color table honored), sub-block de-framing, full LZW decode,
    * four-pass de-interlacing when the interlace flag is set (the JDK
    * writer's default output, so the spec exercises it with real
    * foreign bytes), and palette→gray via (299R + 587G + 114B) / 1000.
    * Returns (w, h, grayscale rows top-down); None for any malformed
    * structure.
    */
  def gifGray(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u8(i: Int): Int = p(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (p.length < 14 || u8(0) != 'G' || u8(1) != 'I' || u8(2) != 'F' ||
        u8(3) != '8' || (u8(4) != '7' && u8(4) != '9') || u8(5) != 'a') return None
    var i = 6
    val packed = u8(i + 4)
    var palette: Array[Int] = null // 0xRRGGBB entries
    i += 7 // logical screen descriptor
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (i + 3 * n > p.length) return None
      palette = Array.tabulate(n)(j => (u8(i + 3 * j) << 16) | (u8(i + 3 * j + 1) << 8) | u8(i + 3 * j + 2))
      i += 3 * n
    }
    // block walk to the first image descriptor
    while (i < p.length) {
      u8(i) match {
        case 0x21 => // extension: label byte then sub-blocks
          i += 2
          while (i < p.length && u8(i) != 0) i += 1 + u8(i)
          i += 1
        case 0x2c =>
          if (i + 10 > p.length) return None
          val w = le16(i + 5); val h = le16(i + 7)
          val ipacked = u8(i + 9)
          i += 10
          val interlaced = (ipacked & 0x40) != 0
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            if (i + 3 * n > p.length) return None
            palette = Array.tabulate(n)(j =>
              (u8(i + 3 * j) << 16) | (u8(i + 3 * j + 1) << 8) | u8(i + 3 * j + 2))
            i += 3 * n
          }
          if (palette == null || w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14))
            return None
          if (i >= p.length) return None
          val minCodeSize = u8(i); i += 1
          val data = new java.io.ByteArrayOutputStream()
          while (i < p.length && u8(i) != 0) {
            val n = u8(i)
            if (i + 1 + n > p.length) return None
            data.write(p, i + 1, n)
            i += 1 + n
          }
          return lzwDecode(data.toByteArray, minCodeSize, w * h).flatMap { raw =>
            // interlaced streams carry rows in four passes (GIF89a
            // s20: rows 0,8,16.. then 4,12.. then 2,6.. then odd);
            // de-interlace by mapping stored row k -> display row
            val idx =
              if (!interlaced) raw
              else {
                val out = new Array[Byte](w * h)
                val passes = Seq((0, 8), (4, 8), (2, 4), (1, 2))
                var k = 0
                for ((start, step) <- passes; row <- start until h by step) {
                  System.arraycopy(raw, k * w, out, row * w, w)
                  k += 1
                }
                out
              }
            val gray = new Array[Int](w * h)
            var j = 0
            while (j < gray.length) {
              val pi = idx(j) & 0xff
              if (pi >= palette.length) return None
              val rgb = palette(pi)
              gray(j) = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                114 * (rgb & 0xff)) / 1000
              j += 1
            }
            Some((w, h, gray))
          }
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None
  }

  /** COMPLETE grayscale GIF89a with REAL LZW-compressed pixel data: a
    * 256-entry gray global color table (entry i = (i,i,i), so the luma
    * in [[gifGray]] recovers the written value exactly), one image
    * descriptor, and the [[lzwEncode]] stream framed into <=255-byte
    * sub-blocks.
    */
  private[graft] def gifPixelBytes(w: Int, h: Int, gray: Array[Int]): Array[Byte] = {
    require(gray.length == w * h, s"expected ${w * h} pixels, got ${gray.length}")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    out.write(0xf7) // global color table, 8-bit color res, 256 entries
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    var c = 0
    while (c < 256) { out.write(c); out.write(c); out.write(c); c += 1 }
    out.write(0x2c) // image descriptor
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    out.write(0)    // no local color table, not interlaced
    out.write(8)    // LZW min code size
    val lzw = lzwEncode(gray.map(v => (v & 0xff).toByte), 8)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF twin of [[Multimodal.bmpPixelMedia]] / [[Multimodal.pngPixelMedia]]:
    * SAME cellGray pixel formula, third container — real LZW
    * compression — so the shared n94 oracle replay certifies all three
    * byte-level decoders against one arithmetic truth.
    */
  def gifPixelMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, src) =>
        val gray = Array.tabulate(72)(cell =>
          Multimodal.cellGray(id / 4, (id % 4).toInt, cell))
        (id, "image", gifPixelBytes(9, 8, gray), src)
      }
      .toDF("media_id", "media_type", "payload", "meta_source")
  }
}
