package graft.multimodal

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq((1L, "hello multimodal world"), (2L, "bytes")).toDF("doc_id", "text")

  test("withFakeMedia produces a binary column; decodeMeta adds typed metadata") {
    val media = Multimodal.withFakeMedia(docs, "text")
    assert(media.schema("media").dataType.typeName == "binary")
    val out = Multimodal.decodeMeta(media, "media").collect()
      .map(r => r.getLong(0) -> r.getStruct(r.length - 1)).toMap
    val m1 = out(1L)
    assert(m1.getAs[Long]("n_bytes") == "hello multimodal world".length.toLong)
    assert(m1.getAs[Int]("width") >= 1 && m1.getAs[Int]("width") <= 1024)
    // deterministic: same input → same fake decode
    val again = Multimodal.decodeMeta(media, "media").collect()
      .map(r => r.getLong(0) -> r.getStruct(r.length - 1)).toMap
    assert(again(1L) == m1)
  }

  test("featurize emits a normalized histogram of the payload") {
    val out = Multimodal.featurize(Multimodal.withFakeMedia(docs, "text"), "media")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](r.length - 1)).toMap
    val h = out(1L)
    assert(h.size == 16)
    assert(approx(h.sum, 1.0))
  }

  /** Render a real image in-memory with the JDK's own encoder — a genuine
    * PNG/JPEG byte stream, no external fixture files or libraries.
    */
  private def renderImage(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7 + y * 13) % 256) * 0x010101)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("ImageIoCodec decodes real PNG and JPEG headers (width/height/format)") {
    val rows = Seq(
      (1L, renderImage(37, 21, "png")),
      (2L, renderImage(64, 48, "jpg")),
      (3L, "not an image at all".getBytes("UTF-8")))
    val df = rows.toDF("doc_id", "media")
    val out = Multimodal.decodeMeta(df, "media", ImageIoCodec).collect()
      .map(r => r.getLong(0) -> r.getStruct(r.length - 1)).toMap
    assert(out(1L).getAs[String]("format") == "png")
    assert(out(1L).getAs[Int]("width") == 37)
    assert(out(1L).getAs[Int]("height") == 21)
    assert(out(1L).getAs[Long]("n_bytes") == rows(0)._2.length.toLong)
    assert(out(2L).getAs[String]("format") == "jpeg")
    assert(out(2L).getAs[Int]("width") == 64)
    assert(out(2L).getAs[Int]("height") == 48)
    // non-image blobs degrade to "unknown" instead of throwing mid-scan
    assert(out(3L).getAs[String]("format") == "unknown")
    assert(out(3L).getAs[Int]("width") == 0)
  }

  test("ImageIoCodec.lumaHistogram decodes real pixels to a normalized histogram") {
    val png = renderImage(16, 16, "png")
    val Some(h) = ImageIoCodec.lumaHistogram(png)
    assert(h.length == 16)
    assert(approx(h.sum, 1.0))
    // the gradient fill spans many luma values — not a single-bin histogram
    assert(h.count(_ > 0.0) > 4)
    assert(ImageIoCodec.lumaHistogram("plain text".getBytes("UTF-8")).isEmpty)
  }

  /** Gradient image with a tunable direction — nearby `tilt`s give perceptually
    * similar images, distant ones don't.
    */
  private def gradientImage(w: Int, h: Int, tilt: Int, fmt: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.min(255, math.max(0, (x * (64 + tilt) + y * 64) / w))
      img.setRGB(x, y, v * 0x010101)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("dHash: identical pixels -> identical hash; mild change -> small " +
    "hamming; different structure -> large hamming") {
    val base = gradientImage(64, 64, 0)
    val mild = gradientImage(64, 64, 2)
    // inverted gradient: right-to-left ordering flips every comparison bit
    val noise = renderImage(64, 64, "png")
    val Some(hBase) = ImageIoCodec.dHash(base)
    val Some(hSame) = ImageIoCodec.dHash(gradientImage(64, 64, 0))
    val Some(hMild) = ImageIoCodec.dHash(mild)
    val Some(hNoise) = ImageIoCodec.dHash(noise)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hBase == hSame)
    assert(ham(hBase, hMild) <= 6, s"mild perturbation moved ${ham(hBase, hMild)} bits")
    assert(ham(hBase, hNoise) > 10, s"unrelated image only ${ham(hBase, hNoise)} bits away")
    assert(ImageIoCodec.dHash("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("perceptualDupPairs finds near-dup images via banded join, skips " +
    "unrelated and undecodable blobs") {
    val rows = Seq(
      (1L, gradientImage(64, 64, 0)),
      (2L, gradientImage(64, 64, 1)),      // near dup of 1
      (3L, renderImage(64, 64, "png")),    // unrelated structure
      (4L, "junk bytes".getBytes("UTF-8")) // undecodable: dropped, not thrown
    ).toDF("doc_id", "media")
    val pairs = Multimodal.perceptualDupPairs(rows, "doc_id", "media",
        maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"pairs: ${pairs.toSeq}")
    assert(pairs.head._3 <= 3)
  }

  test("WavCodec parses a WAV written by javax.sound.sampled (independent fixture)") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 11025 Hz, stereo, 16-bit signed LE, 250 frames of silence — written by
    // the JDK's OWN wav writer, parsed by OUR parser
    val fmt = new AudioFormat(11025f, 16, 2, true, false)
    val nFrames = 250L
    val pcm = new Array[Byte]((nFrames * fmt.getFrameSize).toInt)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val parsed = WavCodec.decode(bos.toByteArray)
    assert(parsed.isDefined, "JDK-written WAV must parse")
    val a = parsed.get
    assert(a.format == "wav" && a.sampleRate == 11025 && a.channels == 2 &&
      a.bitsPerSample == 16 && a.nFrames == 250L)
    assert(a.durationMs == 250L * 1000L / 11025L)
    assert(a.nBytes == bos.size().toLong)
  }

  test("WavCodec round-trip, chunk skipping, and graceful rejection") {
    val blob = WavCodec.encode(sampleRate = 16000, channels = 1,
      bitsPerSample = 16, nFrames = 320)
    val a = WavCodec.decode(blob).get
    assert(a.sampleRate == 16000 && a.channels == 1 && a.nFrames == 320L &&
      a.durationMs == 20L && a.nBytes == 44L + 640L)
    // an unknown ODD-sized chunk spliced before fmt/data must be skipped
    // (with its RIFF even-byte pad honored)
    val body = blob.drop(12)
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0) // 5 data + pad
    val spliced = blob.take(12) ++ extra ++ body
    // fix the RIFF size field (not that the parser reads it, but stay honest)
    val withChunk = spliced.clone()
    val b = WavCodec.decode(withChunk).get
    assert(b.sampleRate == 16000 && b.nFrames == 320L)
    // non-WAV payloads: None, never a throw
    assert(WavCodec.decode("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(WavCodec.decode(Array.empty[Byte]).isEmpty)
    // truncated/corrupt chunk length: None
    val corrupt = blob.clone()
    corrupt(40) = -1; corrupt(41) = -1; corrupt(42) = -1; corrupt(43) = -1
    assert(WavCodec.decode(corrupt).isEmpty)
  }

  test("synthWavMedia → decodeAudioMeta recovers the generator parameters; " +
      "non-WAV rows yield null metadata") {
    val params = Seq((1L, 8000, 1, 10), (2L, 24000, 2, 100))
      .toDF("doc_id", "sr", "ch", "nf")
    val parsed = Multimodal.decodeAudioMeta(
        Multimodal.synthWavMedia(params, "sr", "ch", "nf"), "media")
      .orderBy("doc_id").collect()
    assert(parsed(0).getString(5) == "wav") // doc_id, sr, ch, nf, media, format...
    assert(parsed(0).getLong(6) == 8000L && parsed(0).getLong(7) == 1L)
    assert(parsed(1).getLong(9) == 100L)  // n_frames
    assert(parsed(1).getLong(10) == 100L * 1000L / 24000L)
    val mixed = Multimodal.decodeAudioMeta(
      Multimodal.withFakeMedia(docs, "text"), "media")
    assert(mixed.filter(mixed("format").isNull).count() == mixed.count(),
      "text blobs are not WAVs → all-null audio metadata")
  }

  test("Mp4Codec round-trip recovers every header field") {
    val blob = Mp4Codec.encode("isom", nTracks = 2, timescale = 600L,
      durationUnits = 1500L, payloadBytes = 33)
    val v = Mp4Codec.decode(blob).get
    assert(v.format == "mp4" && v.majorBrand == "isom" && v.nTracks == 2)
    assert(v.timescale == 600L && v.durationUnits == 1500L)
    assert(v.durationMs == 1500L * 1000L / 600L) // 2500
    assert(v.mdatBytes == 33L)
    assert(v.nBytes == blob.length.toLong &&
      blob.length == 148 + 100 * 2 + 33)
  }

  test("Mp4Codec parses a hand-laid fixture: free boxes, version-1 mvhd, " +
      "64-bit largesize mdat") {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)
    def cc(s: String) = s.getBytes("US-ASCII")
    // ftyp with three compatible brands (28 bytes)
    val ftyp = be32(28) ++ cc("ftyp") ++ cc("mp42") ++ be32(512) ++
      cc("mp42") ++ cc("isom") ++ cc("avc1")
    // top-level free box the walker must skip by size
    val free = be32(16) ++ cc("free") ++ Array.fill[Byte](8)(0x5a)
    // moov: [free child][mvhd v1][trak][trak][trak]
    val mvhdV1 = be32(120) ++ cc("mvhd") ++
      Array[Byte](1, 0, 0, 0) ++ // version 1
      be64(0L) ++ be64(0L) ++    // creation/modification (64-bit)
      be32(90000L) ++            // timescale
      be64(450000L) ++           // duration (64-bit)
      Array.fill[Byte](120 - 8 - 4 - 8 - 8 - 4 - 8)(0)
    val trak = be32(16) ++ cc("trak") ++ be32(8) ++ cc("tkhd")
    val innerFree = be32(8) ++ cc("free")
    val moovPayload = innerFree ++ mvhdV1 ++ trak ++ trak ++ trak
    val moov = be32(8L + moovPayload.length) ++ cc("moov") ++ moovPayload
    // mdat with size==1 → 64-bit largesize (16-byte header + 5 payload)
    val mdat = be32(1) ++ cc("mdat") ++ be64(21L) ++
      Array[Byte](1, 2, 3, 4, 5)
    val fixture = ftyp ++ free ++ moov ++ mdat
    val v = Mp4Codec.decode(fixture).get
    assert(v.majorBrand == "mp42" && v.nTracks == 3)
    assert(v.timescale == 90000L && v.durationUnits == 450000L)
    assert(v.durationMs == 450000L * 1000L / 90000L) // 5000 ms
    assert(v.mdatBytes == 5L && v.nBytes == fixture.length.toLong)
  }

  test("Mp4Codec graceful rejection: non-MP4, truncated, corrupt sizes, " +
      "missing moov") {
    assert(Mp4Codec.decode("definitely not a video".getBytes("UTF-8")).isEmpty)
    assert(Mp4Codec.decode(Array.empty[Byte]).isEmpty)
    val good = Mp4Codec.encode("isom", 1, 1000L, 2000L, 16)
    // truncated mid-mdat: the mdat's declared size overruns the buffer
    assert(Mp4Codec.decode(good.dropRight(5)).isEmpty)
    // corrupt moov size (overruns)
    val corrupt = good.clone()
    corrupt(24) = 0x7f // moov size forced huge
    assert(Mp4Codec.decode(corrupt).isEmpty)
    // ftyp alone (no moov): rejected — no timescale/duration to report
    assert(Mp4Codec.decode(good.take(24)).isEmpty)
  }

  test("mdatPayload reads the ISO 14496-12 size escapes: size==1 64-bit " +
      "largesize (how real >4 GB mdats are written) and size==0 to-EOF") {
    def u32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def u64(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xffffffffL)
    val payload = Array.tabulate(100)(i => (i * 7 + 3).toByte)
    val free = u32(16L) ++ "free".getBytes("US-ASCII") ++ new Array[Byte](8)
    // largesize form behind a leading free box: [1]["mdat"][16+n][payload]
    val large = free ++ u32(1L) ++ "mdat".getBytes("US-ASCII") ++
      u64(16L + payload.length) ++ payload
    assert(Mp4Codec.mdatPayload(large).map(_.toSeq).contains(payload.toSeq))
    // size==0: box extends to end of file
    val toEof = free ++ u32(0L) ++ "mdat".getBytes("US-ASCII") ++ payload
    assert(Mp4Codec.mdatPayload(toEof).map(_.toSeq).contains(payload.toSeq))
    // the fingerprint sees identical sample bytes through either header
    val normal = Mp4Codec.encodeWithMdat("isom", 1, 1000L, 2000L, payload)
    assert(Mp4Codec.videoFingerprint(large) ==
      Mp4Codec.videoFingerprint(normal))
    assert(Mp4Codec.videoFingerprint(toEof) ==
      Mp4Codec.videoFingerprint(normal))
    // truncated largesize header: rejected, not mis-sliced
    assert(Mp4Codec.mdatPayload(
      u32(1L) ++ "mdat".getBytes("US-ASCII") ++ u32(99L)).isEmpty)
    // largesize overrunning the buffer: rejected
    assert(Mp4Codec.mdatPayload(u32(1L) ++ "mdat".getBytes("US-ASCII") ++
      u64(1L << 40) ++ payload).isEmpty)
  }

  test("synthMp4Media → decodeVideoMeta recovers the generator parameters; " +
      "non-MP4 rows yield null metadata") {
    val params = Seq((1L, "isom", 1, 600L, 1200L, 10),
        (2L, "mp42", 3, 1000L, 500L, 0))
      .toDF("doc_id", "brand", "nt", "ts", "du", "pb")
    val parsed = Multimodal.decodeVideoMeta(
        Multimodal.synthMp4Media(params, "brand", "nt", "ts", "du", "pb"),
        "media")
      .orderBy("doc_id").collect()
    // columns: doc_id, brand, nt, ts, du, pb, media, format, major_brand,
    // n_tracks, timescale, duration_units, duration_ms, mdat_bytes, n_bytes
    assert(parsed(0).getString(7) == "mp4")
    assert(parsed(0).getString(8) == "isom" && parsed(0).getLong(9) == 1L)
    assert(parsed(0).getLong(10) == 600L && parsed(0).getLong(11) == 1200L)
    assert(parsed(0).getLong(12) == 2000L) // 1200 units / 600 ts = 2 s
    assert(parsed(1).getString(8) == "mp42" && parsed(1).getLong(9) == 3L)
    assert(parsed(1).getLong(12) == 500L && parsed(1).getLong(13) == 0L)
    val mixed = Multimodal.decodeVideoMeta(
      Multimodal.withFakeMedia(docs, "text"), "media")
    assert(mixed.filter(mixed("format").isNull).count() == mixed.count(),
      "text blobs are not MP4s → all-null video metadata")
  }

  test("frameSample explodes n frames per blob with correct offsets") {
    val out = Multimodal.frameSample(Multimodal.withFakeMedia(docs, "text"), "media",
      n = 3, frameBytes = 4)
    val frames = out.filter("doc_id = 1").collect()
    assert(frames.length == 3)
    // columns: doc_id, text, media, frame_idx, frame
    assert(frames.map(_.getInt(3)).toSeq == Seq(0, 1, 2))
    val f0 = new String(frames(0).getAs[Array[Byte]](4), "UTF-8")
    assert(f0 == "hell")
  }
}
