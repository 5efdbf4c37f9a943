package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Perceptual video near-dup through the banded-Hamming path over REAL
  * ISO-BMFF containers: a one-window perturbed copy must pair with its
  * base, unrelated payloads must not, banding must agree with brute
  * force, and the encode → box-walk → fingerprint path must round-trip.
  */
class VideoNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private val Win = 65

  private def payload(seed: Int): Seq[Int] =
    (0 until Win).map { w =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"v${seed}_$w".getBytes("UTF-8"))
      (java.lang.Long.parseLong(
        md.take(4).map(b => f"${b & 0xff}%02x").mkString, 16) % 256).toInt
    }

  private def render(rows: Seq[(Long, Seq[Int])]) =
    Multimodal.synthMp4Samples(rows.toDF("id", "samples"), "samples")

  test("a one-window perturbed copy pairs with its base; unrelated " +
      "payloads stay unpaired") {
    val base = payload(42)
    val perturbed = base.updated(11, (base(11) + 97) % 256)
    val vids = render(Seq(
      (1L, base), (2L, perturbed), (3L, payload(7)), (4L, payload(99))))
    val pairs = Multimodal.videoDupPairs(vids, "id", "media", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)),
      s"got ${pairs.toSeq}")
    assert(pairs.head._3 <= 2)
  }

  test("banded candidates agree with brute-force over the fingerprints") {
    val vids = render((1L to 10L).map { i =>
      if (i <= 5) {
        val b = payload(3)
        (i, (0 until (i.toInt - 1)).foldLeft(b)((p, j) =>
          p.updated(j * 11, (p(j * 11) + 120) % 256)))
      } else (i, payload(i.toInt * 17))
    })
    val banded = Multimodal.videoDupPairs(vids, "id", "media", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hashes = vids.rdd.map(r => (r.getLong(0),
        Mp4Codec.videoFingerprint(r.getAs[Array[Byte]](r.length - 1)).get))
      .collect().toSeq
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(banded == brute, s"banded $banded != brute $brute")
    assert(brute.nonEmpty)
  }

  test("encodeWithMdat round-trips: decode sees the real container, " +
      "mdatPayload returns the exact bytes, fingerprint matches the " +
      "sign-of-delta closed form") {
    val s = payload(5)
    val bytes = Mp4Codec.encodeWithMdat("isom", 1, 1000L, 2000L,
      s.map(v => (v & 0xff).toByte).toArray)
    val meta = Mp4Codec.decode(bytes).get
    assert(meta.majorBrand == "isom" && meta.nTracks == 1 &&
      meta.mdatBytes == Win.toLong)
    assert(Mp4Codec.mdatPayload(bytes).get.toSeq ==
      s.map(v => (v & 0xff).toByte).toSeq)
    val fp = Mp4Codec.videoFingerprint(bytes).get
    val want = (0 until 64).foldLeft(0L)((acc, b) =>
      if (s(b + 1) > s(b)) acc | (1L << b) else acc)
    assert(fp == want, f"fp=$fp%x want=$want%x")
  }

  test("blobs without a windowable mdat drop out instead of pairing") {
    val tiny = Mp4Codec.encodeWithMdat("isom", 1, 1000L, 2000L,
      Array.fill(10)(1.toByte))
    assert(Mp4Codec.videoFingerprint(tiny).isEmpty)
    assert(Mp4Codec.videoFingerprint(Array[Byte](1, 2, 3)).isEmpty)
    // a WAV is not an MP4 — the box walk rejects it
    assert(Mp4Codec.videoFingerprint(
      WavCodec.encode(16000, 1, 16, 100)).isEmpty)
  }

  test("plan shape passes ScaleGuard in fail mode") {
    val vids = render(Seq((1L, payload(1)), (2L, payload(2))))
    spark.conf.set(graft.plans.ScaleGuard.FailConf, "true")
    try {
      graft.plans.ScaleGuard.check(spark)(
        Multimodal.videoDupPairs(vids, "id", "media")
          .queryExecution.analyzed)
    } finally spark.conf.unset(graft.plans.ScaleGuard.FailConf)
  }
}
