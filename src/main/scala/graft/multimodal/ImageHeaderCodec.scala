package graft.multimodal

final case class ImageMeta(format: String, width: Int, height: Int,
                           bitDepth: Int, nChannels: Int, nBytes: Long)

/** REAL image header parser — the fourth real codec behind the media seam,
  * after [[ImageIoCodec]], [[WavCodec]] and [[Mp4Codec]]: reads dimensions,
  * bit depth and channel count straight from the PNG IHDR chunk (ISO/IEC
  * 15948 §11.2.2 — 8-byte signature, big-endian length+type chunks, CRC-32
  * over type+data) or from a JPEG SOFn frame header (ITU-T T.81 §B.2.2 —
  * marker walk: 0xFF id, big-endian segment lengths that include
  * themselves, standalone RSTn/TEM markers carry no length). Unlike
  * [[ImageIoCodec]] this never constructs a reader chain or a stream — one
  * pass over the leading bytes of the blob, allocation-free, the cheapest
  * possible shape for a 100 TB image-metadata sweep where even
  * reader-plugin dispatch per blob is measurable. Returns None for
  * anything else (or truncated/corrupt headers, including a failed IHDR
  * CRC) so mixed-media scans degrade gracefully.
  */
object ImageHeaderCodec extends Serializable {
  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def putBe16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = ((v >> 8) & 0xff).toByte; b(o + 1) = (v & 0xff).toByte
  }
  private def putBe32(b: Array[Byte], o: Int, v: Long): Unit = {
    b(o) = ((v >> 24) & 0xff).toByte; b(o + 1) = ((v >> 16) & 0xff).toByte
    b(o + 2) = ((v >> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG color type → samples per pixel (spec §6.1): gray, rgb, palette
    * index, gray+alpha, rgb+alpha.
    */
  def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    case t => throw new IllegalArgumentException(s"bad PNG color type $t")
  }

  private def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b, off, len)
    c.getValue
  }

  def decode(bytes: Array[Byte]): Option[ImageMeta] = {
    if (bytes.length >= 8 && java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, 0, 8), PngSig))
      decodePng(bytes)
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8)
      decodeJpeg(bytes)
    else None
  }

  /** IHDR is REQUIRED to be the first chunk; its CRC is verified (a silent
    * bit flip in dimensions would otherwise poison downstream stats).
    */
  private def decodePng(b: Array[Byte]): Option[ImageMeta] = {
    // 8 sig + 4 len + 4 "IHDR" + 13 data + 4 crc
    if (b.length < 33) return None
    if (be32(b, 8) != 13L) return None
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    if (crc32(b, 12, 17) != be32(b, 29)) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    if (!Set(0, 2, 3, 4, 6).contains(colorType)) return None
    Some(ImageMeta("png", w.toInt, h.toInt, bitDepth, pngChannels(colorType),
      b.length.toLong))
  }

  /** Marker walk to the first SOFn (baseline C0 … lossless CF, minus the
    * non-frame C4/C8/CC): precision, height, width, component count.
    */
  private def decodeJpeg(b: Array[Byte]): Option[ImageMeta] = {
    var off = 2
    while (off + 4 <= b.length) {
      if ((b(off) & 0xff) != 0xff) return None
      var marker = b(off + 1) & 0xff
      // fill bytes: consecutive 0xFFs before a marker are legal padding
      var moved = off + 1
      while (marker == 0xff && moved + 1 < b.length) {
        moved += 1; marker = b(moved) & 0xff
      }
      off = moved - 1
      if (marker == 0xd9) return None                     // EOI before SOF
      else if ((marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
        off += 2                                          // standalone RSTn/TEM
      } else {
        if (off + 4 > b.length) return None
        val len = be16(b, off + 2)
        if (len < 2 || off + 2 + len > b.length) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 8) return None
          val precision = b(off + 4) & 0xff
          val h = be16(b, off + 5)
          val w = be16(b, off + 7)
          val nc = b(off + 9) & 0xff
          if (w <= 0 || h <= 0 || nc <= 0) return None
          return Some(ImageMeta("jpeg", w, h, precision, nc, b.length.toLong))
        }
        off += 2 + len
      }
    }
    None
  }

  /** Emit a PNG whose header any spec-conforming parser reads back: real
    * signature, a CRC-correct IHDR, one IDAT of `payloadBytes` opaque bytes
    * (deterministic filler — header-only consumers never inflate it, the
    * [[WavCodec.encode]] payload convention), and IEND. Total size is the
    * closed form 57 + payloadBytes the oracle replays.
    */
  def encodePng(width: Int, height: Int, bitDepth: Int, colorType: Int,
                payloadBytes: Int): Array[Byte] = {
    require(width > 0 && height > 0 && payloadBytes >= 0 &&
      Set(1, 2, 4, 8, 16).contains(bitDepth),
      s"bad png params w=$width h=$height bd=$bitDepth pb=$payloadBytes")
    pngChannels(colorType) // validates colorType
    val out = new Array[Byte](57 + payloadBytes)
    PngSig.copyToArray(out, 0)
    putBe32(out, 8, 13L)
    "IHDR".getBytes("US-ASCII").copyToArray(out, 12)
    putBe32(out, 16, width.toLong)
    putBe32(out, 20, height.toLong)
    out(24) = bitDepth.toByte
    out(25) = colorType.toByte
    out(26) = 0; out(27) = 0; out(28) = 0 // deflate, adaptive filter, no interlace
    putBe32(out, 29, crc32(out, 12, 17))
    var o = 33
    putBe32(out, o, payloadBytes.toLong)
    "IDAT".getBytes("US-ASCII").copyToArray(out, o + 4)
    var i = 0
    while (i < payloadBytes) {
      out(o + 8 + i) = ((i * 37 + 5) & 0xff).toByte; i += 1
    }
    putBe32(out, o + 8 + payloadBytes, crc32(out, o + 4, 4 + payloadBytes))
    o += 12 + payloadBytes
    putBe32(out, o, 0L)
    "IEND".getBytes("US-ASCII").copyToArray(out, o + 4)
    putBe32(out, o + 8, crc32(out, o + 4, 4))
    out
  }

  /** Emit a JPEG whose marker walk any spec-conforming parser follows:
    * SOI, a JFIF APP0, a baseline SOF0 with real dimensions/components, a
    * COM segment of `payloadBytes` opaque bytes, an SOS header (required
    * by strict readers like the JDK's before they answer header queries),
    * EOI. Total size is the closed form 44 + 5·components + payloadBytes
    * the oracle replays.
    */
  def encodeJpeg(width: Int, height: Int, nComponents: Int,
                 payloadBytes: Int): Array[Byte] = {
    require(width > 0 && width <= 65535 && height > 0 && height <= 65535 &&
      nComponents >= 1 && nComponents <= 4 &&
      payloadBytes >= 0 && payloadBytes <= 65531,
      s"bad jpeg params w=$width h=$height nc=$nComponents pb=$payloadBytes")
    val sofLen = 8 + 3 * nComponents
    val sosLen = 6 + 2 * nComponents
    val out = new Array[Byte](44 + 5 * nComponents + payloadBytes)
    var o = 0
    out(0) = 0xff.toByte; out(1) = 0xd8.toByte; o = 2   // SOI
    out(o) = 0xff.toByte; out(o + 1) = 0xe0.toByte      // APP0 "JFIF"
    putBe16(out, o + 2, 16)
    "JFIF".getBytes("US-ASCII").copyToArray(out, o + 4)
    out(o + 8) = 0; out(o + 9) = 1; out(o + 10) = 1     // \0, v1.1
    out(o + 11) = 0                                     // aspect-ratio units
    putBe16(out, o + 12, 1); putBe16(out, o + 14, 1)    // density 1×1
    out(o + 16) = 0; out(o + 17) = 0                    // no thumbnail
    o += 18
    out(o) = 0xff.toByte; out(o + 1) = 0xc0.toByte      // SOF0 baseline
    putBe16(out, o + 2, sofLen)
    out(o + 4) = 8                                      // precision
    putBe16(out, o + 5, height)
    putBe16(out, o + 7, width)
    out(o + 9) = nComponents.toByte
    var c = 0
    while (c < nComponents) {
      out(o + 10 + 3 * c) = (c + 1).toByte              // component id
      out(o + 11 + 3 * c) = 0x11                        // 1×1 sampling
      out(o + 12 + 3 * c) = 0                           // quant table 0
      c += 1
    }
    o += 2 + sofLen
    out(o) = 0xff.toByte; out(o + 1) = 0xfe.toByte      // COM payload
    putBe16(out, o + 2, 2 + payloadBytes)
    var i = 0
    while (i < payloadBytes) {
      out(o + 4 + i) = ((i * 53 + 13) & 0xff).toByte; i += 1
    }
    o += 4 + payloadBytes
    out(o) = 0xff.toByte; out(o + 1) = 0xda.toByte      // SOS header
    putBe16(out, o + 2, sosLen)
    out(o + 4) = nComponents.toByte
    c = 0
    while (c < nComponents) {
      out(o + 5 + 2 * c) = (c + 1).toByte               // component id
      out(o + 6 + 2 * c) = 0                            // dc/ac table 0
      c += 1
    }
    out(o + 5 + 2 * nComponents) = 0                    // spectral start
    out(o + 6 + 2 * nComponents) = 63.toByte            // spectral end
    out(o + 7 + 2 * nComponents) = 0                    // approximation
    o += 2 + sosLen
    out(o) = 0xff.toByte; out(o + 1) = 0xd9.toByte      // EOI
    out
  }
}
