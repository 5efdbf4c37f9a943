package graft.multimodal

import graft.SparkTestBase

/** Sub-window shift tolerance: the r15 shingled path reads the envelope on
  * a non-overlapping window grid, so a trim that is NOT a whole number of
  * windows re-phases every window boundary and the copy goes invisible.
  * Overlapping windows (hop < window) realign for any trim that is a
  * multiple of the hop. Fixtures here plant a 5-sample trim = 2.5 windows
  * at windowFrames = 2 — the exact case the verdict's negative control
  * demands.
  */
class ShiftedOverlapSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val base = Array.fill(160)(rnd.nextInt(32768))
  private val tail = Array.fill(5)(rnd.nextInt(32768))
  // 5-sample trim = 2.5 windows at W = 2: NOT window-aligned
  private val copy = base.drop(5) ++ tail

  test("audioEnvelopeOverlap / videoEnvelopeOverlap: hop-strided full " +
      "windows; hop = window degenerates to the fixed grid") {
    val wav = WavCodec.encodePcm(16000, Array(1, 3, 5, 7, 9))
    // W = 2, hop = 1: windows (1,3) (3,5) (5,7) (7,9)
    assert(WavCodec.audioEnvelopeOverlap(wav, 2, 1).get.toSeq ==
      Seq(2.0, 4.0, 6.0, 8.0))
    assert(WavCodec.audioEnvelopeOverlap(wav, 2, 2).get.toSeq ==
      WavCodec.audioEnvelopeFixed(wav, 2).get.toSeq)
    val mp4 = Mp4Codec.encodeWithMdat("isom", 1, 1000L, 2000L,
      Array[Byte](10, 20, 30, 40, 50))
    assert(Mp4Codec.videoEnvelopeOverlap(mp4, 2, 1).get.toSeq ==
      Seq(15.0, 25.0, 35.0, 45.0))
    assert(Mp4Codec.videoEnvelopeOverlap(mp4, 2, 2).get.toSeq ==
      Mp4Codec.videoEnvelopeFixed(mp4, 2).get.toSeq)
    intercept[IllegalArgumentException] {
      WavCodec.audioEnvelopeOverlap(wav, 2, 3)
    }
  }

  test("a 2.5-window trimmed AUDIO copy is invisible to the " +
      "NON-overlapping shingled path (negative control) but the hop-1 " +
      "overlap path finds it at hamming 0, offset_hops +5") {
    val df = Seq((1L, base.toSeq), (2L, copy.toSeq)).toDF("doc_id", "samples")
    val wav = Multimodal.synthPcmWav(df, "samples", sampleRate = 16000)
    // 160 samples / W=2 → 80 non-overlapping windows, 15 shingles: the
    // shingled machinery HAS material to work with — it misses because
    // the 2.5-window trim re-phases every window, not for lack of data
    val aligned = Multimodal.audioDupPairsShifted(wav, "doc_id", "media",
      maxHamming = 3, windowFrames = 2).collect()
    assert(aligned.isEmpty,
      s"window-aligned shingled path caught a sub-window trim: ${aligned.toSeq}")
    val overlap = Multimodal.audioDupPairsShiftedOverlap(wav, "doc_id",
        "media", maxHamming = 3, windowFrames = 2, hopFrames = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(overlap.toSeq == Seq((1L, 2L, 0, 5)), overlap.toSeq.toString)
  }

  test("a 2.5-window trimmed VIDEO copy: same negative control and " +
      "overlap recovery through the mdat box walk") {
    val b = base.map(_ % 256)
    val c = copy.map(_ % 256)
    val df = Seq((1L, b.toSeq), (2L, c.toSeq)).toDF("doc_id", "samples")
    val mp4 = Multimodal.synthMp4Samples(df, "samples")
    val aligned = Multimodal.videoDupPairsShifted(mp4, "doc_id", "media",
      maxHamming = 3, windowBytes = 2).collect()
    assert(aligned.isEmpty,
      s"window-aligned shingled path caught a sub-window trim: ${aligned.toSeq}")
    val overlap = Multimodal.videoDupPairsShiftedOverlap(mp4, "doc_id",
        "media", maxHamming = 3, windowBytes = 2, hopBytes = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(overlap.toSeq == Seq((1L, 2L, 0, 5)), overlap.toSeq.toString)
  }

  test("a trim of 1.5 windows (3 samples) is also recovered — tolerance " +
      "granularity is the hop, not the window") {
    val copy3 = base.drop(3) ++ tail.take(3)
    val df = Seq((1L, base.toSeq), (2L, copy3.toSeq)).toDF("doc_id", "samples")
    val wav = Multimodal.synthPcmWav(df, "samples", sampleRate = 16000)
    val overlap = Multimodal.audioDupPairsShiftedOverlap(wav, "doc_id",
        "media", maxHamming = 3, windowFrames = 2, hopFrames = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(overlap.toSeq == Seq((1L, 2L, 0, 3)), overlap.toSeq.toString)
  }
}
