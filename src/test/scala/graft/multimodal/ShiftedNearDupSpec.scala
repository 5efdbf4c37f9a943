package graft.multimodal

import graft.SparkTestBase

class ShiftedNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(3)
  private val base = Array.fill(80)(rnd.nextInt(32768))
  private val tail = Array.fill(5)(rnd.nextInt(32768))
  private val copy = base.drop(5) ++ tail // 5-window trim, fresh tail

  test("envelopeShingles: monotone envelope gives all-ones fingerprints, " +
      "one per 65-window shingle, capped at maxShingles") {
    val e = Array.tabulate(70)(_.toDouble)
    val all = Multimodal.envelopeShingles(e, maxShingles = 256)
    assert(all.map(_._1) == (0 until 6) && all.forall(_._2 == -1L))
    assert(Multimodal.envelopeShingles(e, maxShingles = 2).size == 2)
    assert(Multimodal.envelopeShingles(Array.fill(64)(1.0), 256).isEmpty)
  }

  test("audioEnvelopeFixed / videoEnvelopeFixed: fixed-size windows, " +
      "full windows only") {
    val wav = WavCodec.encodePcm(16000, Array(1, 3, 5, 7, 9))
    // windowFrames = 2: windows (1,3) and (5,7); tail frame 9 dropped
    assert(WavCodec.audioEnvelopeFixed(wav, 2).get.toSeq == Seq(2.0, 6.0))
    val mp4 = Mp4Codec.encodeWithMdat("isom", 1, 1000L, 2000L,
      Array[Byte](10, 20, 30, 40, 50))
    assert(Mp4Codec.videoEnvelopeFixed(mp4, 2).get.toSeq == Seq(15.0, 35.0))
    assert(WavCodec.audioEnvelopeFixed("nope".getBytes, 2).isEmpty)
  }

  test("a 5-window trimmed AUDIO copy is invisible to the whole-signal " +
      "fingerprint (negative control) but the shingled path finds it at " +
      "hamming 0, offset +5") {
    val df = Seq((1L, base.toSeq), (2L, copy.toSeq)).toDF("doc_id", "samples")
    val wav = Multimodal.synthPcmWav(df, "samples", sampleRate = 16000)
    val whole = Multimodal.audioDupPairs(wav, "doc_id", "media",
      maxHamming = 3).collect()
    assert(whole.isEmpty,
      s"whole-signal fingerprint caught the trimmed copy: ${whole.toSeq}")
    val shifted = Multimodal.audioDupPairsShifted(wav, "doc_id", "media",
        maxHamming = 3, windowFrames = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(shifted.toSeq == Seq((1L, 2L, 0, 5)), shifted.toSeq.toString)
  }

  test("a 5-window trimmed VIDEO copy: same negative control and shingled " +
      "recovery through the mdat box walk") {
    val b = base.map(_ % 256)
    val c = copy.map(_ % 256)
    val df = Seq((1L, b.toSeq), (2L, c.toSeq)).toDF("doc_id", "samples")
    val mp4 = Multimodal.synthMp4Samples(df, "samples")
    val whole = Multimodal.videoDupPairs(mp4, "doc_id", "media",
      maxHamming = 3).collect()
    assert(whole.isEmpty,
      s"whole-signal fingerprint caught the trimmed copy: ${whole.toSeq}")
    val shifted = Multimodal.videoDupPairsShifted(mp4, "doc_id", "media",
        maxHamming = 3, windowBytes = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(shifted.toSeq == Seq((1L, 2L, 0, 5)), shifted.toSeq.toString)
  }

  test("window-granular tolerance: at windowFrames = 2 a 2-frame " +
      "(one-window) trim is found, a 1-frame (sub-window) trim is not — " +
      "the documented granularity") {
    val long = Array.fill(140)(rnd.nextInt(32768))
    val oneWin = long.drop(2) ++ Array.fill(2)(rnd.nextInt(32768))
    val half = long.drop(1) ++ Array.fill(1)(rnd.nextInt(32768))
    val df = Seq((1L, long.toSeq), (2L, oneWin.toSeq), (3L, half.toSeq))
      .toDF("doc_id", "samples")
    val wav = Multimodal.synthPcmWav(df, "samples", sampleRate = 16000)
    val got = Multimodal.audioDupPairsShifted(wav, "doc_id", "media",
        maxHamming = 3, windowFrames = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq == Seq((1L, 2L, 0, 1)), got.toSeq.toString)
  }
}
