package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ImageHeaderCodecSpec extends SparkTestBase {
  import spark.implicits._

  private def render(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7 + y * 13) % 256) * 0x010101)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("decodes PNGs and JPEGs written by javax.imageio (independent " +
      "encoder differential)") {
    val png = ImageHeaderCodec.decode(render(37, 21, "png")).get
    assert(png.format == "png" && png.width == 37 && png.height == 21)
    assert(png.bitDepth == 8 && png.nChannels == 3) // RGB truecolor
    val jpg = ImageHeaderCodec.decode(render(64, 48, "jpg")).get
    assert(jpg.format == "jpeg" && jpg.width == 64 && jpg.height == 48)
    assert(jpg.bitDepth == 8 && jpg.nChannels == 3)
  }

  test("encodePng round-trips every header field and the closed-form size; " +
      "javax.imageio agrees on the dimensions (cross-codec differential)") {
    for ((w, h, bd, ct) <- Seq((1, 1, 8, 0), (640, 480, 8, 2),
        (1021, 997, 16, 6), (5, 9, 8, 4), (12, 3, 8, 3))) {
      val b = ImageHeaderCodec.encodePng(w, h, bd, ct, payloadBytes = 11)
      assert(b.length == 57 + 11)
      val m = ImageHeaderCodec.decode(b).get
      assert(m == ImageMeta("png", w, h, bd,
        ImageHeaderCodec.pngChannels(ct), b.length.toLong))
    }
    // ImageIO's PNG reader answers header queries from the same IHDR
    val b = ImageHeaderCodec.encodePng(33, 77, 8, 2, payloadBytes = 4)
    val io = ImageIoCodec.decode(b)
    assert(io.format == "png" && io.width == 33 && io.height == 77)
  }

  test("encodeJpeg round-trips every header field and the closed-form size; " +
      "javax.imageio agrees on the dimensions (cross-codec differential)") {
    for ((w, h, nc) <- Seq((1, 1, 1), (65535, 1, 3), (300, 200, 4))) {
      val b = ImageHeaderCodec.encodeJpeg(w, h, nc, payloadBytes = 7)
      assert(b.length == 44 + 5 * nc + 7)
      val m = ImageHeaderCodec.decode(b).get
      assert(m == ImageMeta("jpeg", w, h, 8, nc, b.length.toLong))
    }
    val b = ImageHeaderCodec.encodeJpeg(41, 29, 3, payloadBytes = 0)
    val io = ImageIoCodec.decode(b)
    assert(io.format.startsWith("jp") && io.width == 41 && io.height == 29)
  }

  test("JPEG marker walk: fill bytes, standalone RST/TEM markers, and a " +
      "progressive SOF2 are all handled") {
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(0xff, 0xd8).map(_.toByte))          // SOI
    bos.write(Array(0xff, 0xff, 0xff, 0x01).map(_.toByte)) // fill + TEM
    bos.write(Array(0xff, 0xd0).map(_.toByte))          // RST0 standalone
    bos.write(Array(0xff, 0xfe).map(_.toByte))          // COM len 4
    bos.write(be16(4)); bos.write(Array(1.toByte, 2.toByte))
    bos.write(Array(0xff, 0xc2).map(_.toByte))          // SOF2 progressive
    bos.write(be16(11))                                 // 8 + 3*1
    bos.write(12)                                       // precision 12
    bos.write(be16(777)); bos.write(be16(555))
    bos.write(1); bos.write(Array(1.toByte, 0x11.toByte, 0.toByte))
    bos.write(Array(0xff, 0xd9).map(_.toByte))          // EOI
    val m = ImageHeaderCodec.decode(bos.toByteArray).get
    assert(m == ImageMeta("jpeg", 555, 777, 12, 1, bos.size().toLong))
  }

  test("graceful rejection: truncated, corrupt CRC, non-IHDR first chunk, " +
      "EOI before SOF, bad segment lengths, non-image bytes") {
    val good = ImageHeaderCodec.encodePng(10, 10, 8, 2, 5)
    assert(ImageHeaderCodec.decode(good.take(20)).isEmpty) // truncated
    val badCrc = good.clone(); badCrc(18) = (badCrc(18) ^ 1).toByte // width bit flip
    assert(ImageHeaderCodec.decode(badCrc).isEmpty)
    val notIhdr = good.clone(); notIhdr(12) = 'X'.toByte
    assert(ImageHeaderCodec.decode(notIhdr).isEmpty)
    // JPEG: SOI then EOI, no SOF
    assert(ImageHeaderCodec.decode(
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
    // JPEG: segment length overruns the buffer
    assert(ImageHeaderCodec.decode(
      Array(0xff, 0xd8, 0xff, 0xfe, 0x40, 0x00).map(_.toByte)).isEmpty)
    assert(ImageHeaderCodec.decode("plain text".getBytes("UTF-8")).isEmpty)
    assert(ImageHeaderCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("synthImageMedia → decodeImageMeta recovers the generator params; " +
      "non-image rows yield null metadata") {
    val params = Seq(
      (1L, "png", 100, 50, 8, 2, 10),
      (2L, "jpeg", 30, 40, 8, 3, 0),
      (3L, "png", 7, 7, 16, 6, 3)
    ).toDF("doc_id", "fmt", "w", "h", "bd", "cc", "pb")
    val out = Multimodal.decodeImageMeta(
        Multimodal.synthImageMedia(params, "fmt", "w", "h", "bd", "cc", "pb"),
        "media")
      .select("doc_id", "format", "width", "height", "bit_depth",
        "n_channels", "n_bytes")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "png" && out(1L).getLong(2) == 100 &&
      out(1L).getLong(3) == 50 && out(1L).getLong(4) == 8 &&
      out(1L).getLong(5) == 3 && out(1L).getLong(6) == 67)
    assert(out(2L).getString(1) == "jpeg" && out(2L).getLong(5) == 3 &&
      out(2L).getLong(6) == 44 + 15)
    assert(out(3L).getLong(4) == 16 && out(3L).getLong(5) == 4)
    val mixed = Seq((9L, "junk".getBytes("UTF-8"))).toDF("doc_id", "media")
    val r = Multimodal.decodeImageMeta(mixed, "media").collect()(0)
    // row = (doc_id, media, format, width, height, bit_depth, n_channels, n_bytes)
    assert(r.isNullAt(2) && r.isNullAt(6))
  }
}
