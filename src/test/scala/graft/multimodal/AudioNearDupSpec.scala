package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Perceptual audio near-dup through the banded-Hamming path over REAL
  * PCM WAVs: a one-window perturbed copy of a base waveform must pair
  * with it (true positive), unrelated waveforms must not, the banding
  * must agree with brute-force Hamming over the same fingerprints, and
  * the encode → parse → fingerprint path must round-trip the envelope.
  */
class AudioNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private val Win = 65

  /** Deterministic pseudo-random non-negative sample per (seed, window) —
    * the same md5 convention as the q_audio_near_dup generator.
    */
  private def waveform(seed: Int): Seq[Int] =
    (0 until Win).map { w =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${seed}_$w".getBytes("UTF-8"))
      (java.lang.Long.parseLong(
        md.take(4).map(b => f"${b & 0xff}%02x").mkString, 16) % 32768).toInt
    }

  private def render(rows: Seq[(Long, Seq[Int])]) =
    Multimodal.synthPcmWav(rows.toDF("id", "samples"), "samples",
      sampleRate = 16000)

  test("a one-window perturbed copy pairs with its base at small Hamming; " +
      "unrelated waveforms stay unpaired") {
    val base = waveform(42)
    val perturbed = base.updated(7, (base(7) + 9000) % 32768)
    val wavs = render(Seq(
      (1L, base), (2L, perturbed), (3L, waveform(7)), (4L, waveform(99))))
    val pairs = Multimodal.audioDupPairs(wavs, "id", "media", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)),
      s"got ${pairs.toSeq}")
    assert(pairs.head._3 <= 2,
      s"one-window perturbation flipped >2 envelope bits: ${pairs.toSeq}")
  }

  test("banded candidate generation is EXACT at maxHamming = bands - 1: " +
      "agrees with brute-force over the same fingerprints") {
    val wavs = render((1L to 12L).map { i =>
      if (i <= 6) {
        // chain of single-window perturbations of one base
        val b = waveform(1)
        (i, (0 until (i.toInt - 1)).foldLeft(b)((p, j) =>
          p.updated(j * 9, (p(j * 9) + 11000) % 32768)))
      } else (i, waveform(i.toInt * 13))
    })
    val banded = Multimodal.audioDupPairs(wavs, "id", "media", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hashes = wavs.rdd.map(r => (r.getLong(0),
        WavCodec.audioFingerprint(r.getAs[Array[Byte]](r.length - 1)).get))
      .collect().toSeq
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(banded == brute, s"banded $banded != brute $brute")
    assert(brute.nonEmpty, "fixture produced no near-dup pairs at all")
  }

  test("audioFingerprint round-trips the envelope: bit w = sample(w+1) > " +
      "sample(w) for a one-sample-per-window blob") {
    val s = waveform(5)
    val bytes = WavCodec.encodePcm(16000, s.toArray)
    val fp = WavCodec.audioFingerprint(bytes).get
    val want = (0 until 64).foldLeft(0L)((acc, b) =>
      if (s(b + 1) > s(b)) acc | (1L << b) else acc)
    assert(fp == want, f"fp=$fp%x want=$want%x")
    // and the blob is a well-formed WAV the header parser accepts
    val meta = WavCodec.decode(bytes).get
    assert(meta.nFrames == Win && meta.channels == 1 &&
      meta.bitsPerSample == 16)
  }

  test("blobs that cannot carry the envelope drop out instead of pairing") {
    val short = WavCodec.encodePcm(16000, Array.fill(10)(100))
    assert(WavCodec.audioFingerprint(short).isEmpty)
    assert(WavCodec.audioFingerprint(Array[Byte](1, 2, 3)).isEmpty)
    // 8-bit PCM is not fingerprintable either
    val eightBit = WavCodec.encode(16000, 1, 8, 100)
    assert(WavCodec.audioFingerprint(eightBit).isEmpty)
  }

  test("plan shape passes ScaleGuard in fail mode") {
    val wavs = render(Seq((1L, waveform(1)), (2L, waveform(2))))
    spark.conf.set(graft.plans.ScaleGuard.FailConf, "true")
    try {
      graft.plans.ScaleGuard.check(spark)(
        Multimodal.audioDupPairs(wavs, "id", "media")
          .queryExecution.analyzed)
    } finally spark.conf.unset(graft.plans.ScaleGuard.FailConf)
  }
}
