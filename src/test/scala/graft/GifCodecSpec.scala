package graft

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.ops.{Gif, Multimodal}

/** The GIF LZW codec, pinned against an INDEPENDENT implementation:
  * `javax.imageio`'s GIF reader/writer ship with the JDK, so both
  * codec directions are validated against a reference that has decoded
  * real-world GIFs for decades — not just against each other. The
  * noise images are large enough (128x128) to drive the code width
  * through 10/11/12 bits and into the dictionary-full regime.
  */
class GifCodecSpec extends SparkSpec {

  private def grayPalette: IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  private def noise(w: Int, h: Int, seed: Long): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(w * h)(rnd.nextInt(256))
  }

  private def structured(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => ((i % w) * 7 + (i / w) * 13) % 256)

  test("own encoder -> own decoder round-trips exactly") {
    for ((w, h, px) <- Seq(
        (9, 8, Array.tabulate(72)(c => Multimodal.cellGray(3L, 1, c))),
        (1, 1, Array(42)),
        (64, 64, noise(64, 64, 1L)),
        (128, 128, noise(128, 128, 2L)),     // runs the dictionary full
        (100, 50, structured(100, 50)))) {   // long matches, deep chains
      val bytes = Gif.gifPixelBytes(w, h, px)
      val got = Gif.gifGray(bytes)
      assert(got.isDefined, s"${w}x$h failed to decode")
      val (gw, gh, gray) = got.get
      assert(gw == w && gh == h)
      assert(gray.toSeq == px.toSeq, s"${w}x$h pixel mismatch")
    }
  }

  private def jdkEncode(px: Array[Int], w: Int, h: Int,
      interlaced: Boolean): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y * w + x))
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(
      if (interlaced) javax.imageio.ImageWriteParam.MODE_DEFAULT
      else javax.imageio.ImageWriteParam.MODE_DISABLED)
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  test("JDK ImageIO encoder -> own decoder (width growth + dict-full, both row orders)") {
    for {
      (w, h, seed) <- Seq((16, 16, 3L), (64, 32, 4L), (128, 128, 5L))
      interlaced <- Seq(false, true) // the JDK default is INTERLACED
    } {
      val px = noise(w, h, seed)
      val got = Gif.gifGray(jdkEncode(px, w, h, interlaced))
      assert(got.isDefined, s"${w}x$h interlaced=$interlaced: failed to decode")
      val (gw, gh, gray) = got.get
      assert(gw == w && gh == h)
      assert(gray.toSeq == px.toSeq,
        s"${w}x$h interlaced=$interlaced: pixels diverge from JDK encoding")
    }
  }

  test("own encoder -> JDK ImageIO decoder") {
    for ((w, h, seed) <- Seq((9, 8, 6L), (128, 128, 7L))) {
      val px = noise(w, h, seed)
      val img = ImageIO.read(new ByteArrayInputStream(Gif.gifPixelBytes(w, h, px)))
      assert(img != null, s"${w}x$h: JDK could not read our GIF")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (img.getRGB(x, y) >> 16) & 0xff // gray palette: R channel
        assert(v == px(y * w + x), s"${w}x$h pixel ($x,$y)")
      }
    }
  }

  test("malformed GIFs return None, never throw") {
    assert(Gif.gifGray("not a gif at all".getBytes("US-ASCII")).isEmpty)
    assert(Gif.gifGray(Array.emptyByteArray).isEmpty)
    val good = Gif.gifPixelBytes(9, 8, structured(9, 8))
    assert(Gif.gifGray(good.take(20)).isEmpty)           // truncated in LSD/palette
    assert(Gif.gifGray(good.dropRight(30)).isEmpty)      // truncated LZW stream
    val noSig = good.clone()
    noSig(3) = '9'.toByte                                // "GIF9xa": bad version
    assert(Gif.gifGray(noSig).isEmpty)
  }

  test("gifPixelMedia end-to-end: dhashRelation equals the formula hash per doc") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") <= 6)
    val rel = Multimodal.dhashRelation(Gif.gifPixelMedia(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rel.nonEmpty)
    for ((id, got) <- rel) {
      val g = Array.tabulate(72)(c => Multimodal.cellGray(id / 4, (id % 4).toInt, c))
      assert(got == Multimodal.dHash64(g, 9, 8), s"doc $id")
    }
  }
}
