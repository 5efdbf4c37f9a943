package graft.multimodal

import graft.SparkTestBase

/** Content-defined chunking for media near-dup: boundaries sit where a
  * rolling polynomial of the magnitudes fires, so they move WITH the
  * content — a copy trimmed by ANY number of frames reproduces every
  * interior segment verbatim and the exact (fp, len) join finds it with
  * no fan-out. The overlap tier only reaches granularity hop at a
  * (window/hop)× row fan-out, so an odd trim under hop = 2 is its
  * documented miss — the negative control here.
  */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(13)
  private val base = Array.fill(160)(rnd.nextInt(32768))
  private val tail = Array.fill(8)(rnd.nextInt(32768))

  test("cdcSegments: boundaries are content-defined — a trimmed copy " +
      "reproduces every interior segment at shifted positions") {
    val segsBase = Multimodal.cdcSegments(base)
    assert(segsBase.nonEmpty, "fixture produced no interior segments")
    for (trim <- 1 to 5) {
      val copy = base.drop(trim) ++ tail.take(trim)
      val segsCopy = Multimodal.cdcSegments(copy)
      // every base interior segment fully inside the copied span must
      // reappear with identical (len, fp) at pos - trim
      // preceding cut is at p - 1 and needs its 4-value hash window
      // inside the copied span: p - 1 >= trim + 3
      val shifted = segsBase
        .filter { case (p, l, _) => p >= trim + 4 && p + l <= 160 - trim }
        .map { case (p, l, fp) => (p - trim, l, fp) }
      val copySet = segsCopy.toSet
      val missing = shifted.filterNot(copySet.contains)
      assert(missing.isEmpty,
        s"trim $trim lost interior segments: $missing")
    }
  }

  test("an odd (3-frame) trim is invisible to the hop-2 overlap path " +
      "(negative control) but CDC reports it with offset_frames +3") {
    val copy = base.drop(3) ++ tail.take(3)
    val df = Seq((1L, base.toSeq), (2L, copy.toSeq)).toDF("doc_id", "samples")
    val wav = Multimodal.synthPcmWav(df, "samples", sampleRate = 16000)
    // hop 2 only survives even trims; 3 re-phases every window
    val hop2 = Multimodal.audioDupPairsShiftedOverlap(wav, "doc_id",
      "media", maxHamming = 3, windowFrames = 4, hopFrames = 2).collect()
    assert(hop2.isEmpty,
      s"hop-2 overlap path caught an odd trim: ${hop2.toSeq}")
    val cdc = Multimodal.audioDupPairsCdc(wav, "doc_id", "media").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(cdc.length == 1 && cdc.head._1 == 1L && cdc.head._2 == 2L &&
      cdc.head._4 == 3, cdc.toSeq.toString)
    assert(cdc.head._3 >= 2, s"expected >= 2 shared segments: ${cdc.head}")
  }

  test("every trim 1..5 is recovered with the exact offset witness — " +
      "granularity is one frame at ~1 row per CdcCutMod frames") {
    for (trim <- 1 to 5) {
      val copy = base.drop(trim) ++ tail.take(trim)
      val df = Seq((1L, base.toSeq), (2L, copy.toSeq)).toDF("doc_id", "samples")
      val wav = Multimodal.synthPcmWav(df, "samples", sampleRate = 16000)
      val cdc = Multimodal.audioDupPairsCdc(wav, "doc_id", "media").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      assert(cdc.toSeq == Seq((1L, 2L, trim)), s"trim $trim: ${cdc.toSeq}")
    }
  }

  test("video twin: the 3-byte trim flows through the mdat box walk to " +
      "the same (shared, offset) contract") {
    val b = base.map(_ % 256)
    val copy = (b.drop(3) ++ tail.take(3).map(_ % 256)).toSeq
    val df = Seq((1L, b.toSeq), (2L, copy)).toDF("doc_id", "samples")
    val mp4 = Multimodal.synthMp4Samples(df, "samples")
    val cdc = Multimodal.videoDupPairsCdc(mp4, "doc_id", "media").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(cdc.toSeq == Seq((1L, 2L, 3)), cdc.toSeq.toString)
  }

  test("unrelated blobs share no segments; the df-cap drops a segment " +
      "key shared by more blobs than maxDf") {
    val other = Array.fill(160)(rnd.nextInt(32768))
    val df = Seq((1L, base.toSeq), (2L, other.toSeq))
      .toDF("doc_id", "samples")
    val wav = Multimodal.synthPcmWav(df, "samples", sampleRate = 16000)
    assert(Multimodal.audioDupPairsCdc(wav, "doc_id", "media")
      .collect().isEmpty)
    // the same content in 3 blobs with maxDf = 2: every shared segment
    // key has df 3 > 2, so the cap suppresses all pairs
    val hot = Seq((1L, base.toSeq), (2L, base.toSeq), (3L, base.toSeq))
      .toDF("doc_id", "samples")
    val hotWav = Multimodal.synthPcmWav(hot, "samples", sampleRate = 16000)
    assert(Multimodal.audioDupPairsCdc(hotWav, "doc_id", "media",
      maxDf = 2).collect().isEmpty)
    assert(Multimodal.audioDupPairsCdc(hotWav, "doc_id", "media")
      .collect().length == 3) // all three pairs at the default cap
  }
}
