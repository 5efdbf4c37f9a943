package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.multimodal.Multimodal

/** Replay-pinned end-to-end behavior of the three dedup twins
  * ([[StreamReplay]]): a deterministic timestamped event stream runs
  * through `foreachBatch` into a real table, and the final table is
  * compared against the BATCH twin on the same data — per TTL-epoch for
  * equality, and across epochs to pin the eviction edge (the streamed set
  * must be the per-epoch batch union, NOT the whole-corpus batch result,
  * which would contain the cross-horizon pairs the TTL deliberately
  * forgets).
  */
class StreamReplaySpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
  private val HourMs = 60 * 60000L

  final case class TsDoc(ts: Timestamp, doc_id: Long, text: String)
  final case class FpDoc(ts: Timestamp, doc_id: Long, fingerprint: Long)
  final case class ShRow(ts: Timestamp, doc_id: Long, s: Int, fp: Long)

  test("minhash twin replay: final table == batch LSH pairs per TTL-epoch; " +
      "cross-horizon dups are forgotten (the documented eviction edge)") {
    val dup = "the quick brown fox jumps over the lazy dog and runs far away today"
    val other = "completely different words about spark query engines and data processing"
    val boundary = "yet another unrelated advancing document with its own words entirely"
    // epoch 1: dup pair in-horizon + an unrelated doc; watermark advance;
    // epoch 2: the same text re-seeds, then pairs with a fresh dup
    val batches = Seq(
      Seq(TsDoc(ts(0), 1L, dup), TsDoc(ts(10), 2L, dup),
        TsDoc(ts(12), 3L, other)),
      Seq(TsDoc(ts(180), 4L, boundary)),
      Seq(TsDoc(ts(200), 5L, dup)),
      Seq(TsDoc(ts(205), 6L, dup)))
    val streamed = StreamReplay.replay[TsDoc](spark, batches,
        df => StreamingOps.minhashCandidatesStreamTtl(df, "ts",
          ttlMs = HourMs).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def batchPairs(docs: Seq[(Long, String)]): Set[(Long, Long)] =
      graft.ext.Dedup.minhashLshPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", k = 3, numHashes = 16, rowsPerBand = 4)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val epoch1 = batchPairs(Seq(1L -> dup, 2L -> dup, 3L -> other))
    val epoch2 = batchPairs(Seq(4L -> boundary, 5L -> dup, 6L -> dup))
    assert(epoch1 == Set((1L, 2L)) && epoch2 == Set((5L, 6L)))
    assert(streamed == epoch1 ++ epoch2,
      s"replay table $streamed != per-epoch batch union ${epoch1 ++ epoch2}")
    // the whole-corpus batch twin DOES see the cross-horizon pairs — the
    // streamed table deliberately does not (TTL eviction), batch backstop
    val all = batchPairs(Seq(1L -> dup, 2L -> dup, 3L -> other,
      4L -> boundary, 5L -> dup, 6L -> dup))
    assert((all -- streamed).nonEmpty &&
      (all -- streamed).forall { case (a, b) => a <= 2L && b >= 5L },
      s"unexpected batch-vs-stream delta: ${all -- streamed}")
  }

  test("fingerprint twin replay: final table == exact Hamming pairs per " +
      "TTL-epoch (banded join is pigeonhole-exact, so brute force is the " +
      "batch oracle); eviction edge pinned") {
    val base = 0x0123456789abcdefL
    val near = base ^ (1L << 5) ^ (1L << 40) // hamming 2
    val far = 0x5a5a13377331a5a5L
    val boundary = 0xfedcba9876543210L
    val batches = Seq(
      Seq(FpDoc(ts(0), 1L, base), FpDoc(ts(10), 2L, near),
        FpDoc(ts(12), 3L, far)),
      Seq(FpDoc(ts(180), 4L, boundary)),
      Seq(FpDoc(ts(200), 5L, base)),
      Seq(FpDoc(ts(205), 6L, base ^ (1L << 63))))
    val streamed = StreamReplay.replay[FpDoc](spark, batches,
        df => StreamingOps.fingerprintCandidatesStreamTtl(df, "ts",
          ttlMs = HourMs).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def brute(fps: Seq[(Long, Long)]): Set[(Long, Long, Int)] =
      (for {
        (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
        d = java.lang.Long.bitCount(fa ^ fb) if d <= 3
      } yield (ia, ib, d)).toSet
    val epoch1 = brute(Seq(1L -> base, 2L -> near, 3L -> far))
    val epoch2 = brute(Seq(4L -> boundary, 5L -> base,
      6L -> (base ^ (1L << 63))))
    assert(epoch1 == Set((1L, 2L, 2)) && epoch2 == Set((5L, 6L, 1)))
    assert(streamed == epoch1 ++ epoch2,
      s"replay table $streamed != per-epoch batch union ${epoch1 ++ epoch2}")
    val all = brute(batches.flatten.map(f => f.doc_id -> f.fingerprint))
    assert((all -- streamed).forall { case (a, _, _) => a <= 2L },
      s"unexpected delta: ${all -- streamed}")
    assert((all -- streamed).nonEmpty, "fixture lost its cross-horizon pairs")
  }

  test("shingle twin replay: final table (min-witness reduced) == batch " +
      "audioDupPairsShifted per TTL-epoch through the real WAV round-trip") {
    def shingles(samples: Array[Int]): Seq[(Int, Long)] =
      (0 to samples.length - 65).map { s =>
        var fp = 0L
        (0 until 64).foreach { b =>
          if (samples(s + b + 1) > samples(s + b)) fp |= 1L << b
        }
        (s, fp)
      }
    val rnd = new scala.util.Random(23)
    val base = Array.fill(80)(rnd.nextInt(32768))
    val copy = base.drop(5) ++ Array.fill(5)(rnd.nextInt(32768))
    val other = Array.fill(80)(rnd.nextInt(32768))
    val bnd = Array.fill(80)(rnd.nextInt(32768))
    def rows(id: Long, at: Timestamp, ss: Array[Int]): Seq[ShRow] =
      shingles(ss).map { case (s, fp) => ShRow(at, id, s, fp) }
    val batches = Seq(
      rows(1L, ts(0), base) ++ rows(2L, ts(10), copy) ++
        rows(3L, ts(12), other),
      rows(4L, ts(180), bnd),
      rows(5L, ts(200), base),
      rows(6L, ts(205), copy))
    val streamed = StreamReplay.replay[ShRow](spark, batches,
        df => StreamingOps.shingleCandidatesStreamTtl(df, "ts",
          ttlMs = HourMs).toDF())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getInt(2), r.getInt(3))))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    def batch(docs: Seq[(Long, Array[Int])]): Map[(Long, Long), (Int, Int)] = {
      val wav = Multimodal.synthPcmWav(
        docs.map { case (i, s) => (i, s.toSeq) }.toDF("doc_id", "samples"),
        "samples", sampleRate = 16000)
      Multimodal.audioDupPairsShifted(wav, "doc_id", "media",
          maxHamming = 3, windowFrames = 1).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getInt(2), r.getInt(3))))
        .toMap
    }
    val epoch1 = batch(Seq(1L -> base, 2L -> copy, 3L -> other))
    val epoch2 = batch(Seq(4L -> bnd, 5L -> base, 6L -> copy))
    assert(epoch1 == Map((1L, 2L) -> ((0, 5))) &&
      epoch2 == Map((5L, 6L) -> ((0, 5))))
    assert(streamed == epoch1 ++ epoch2,
      s"replay table $streamed != per-epoch batch union ${epoch1 ++ epoch2}")
  }

  test("canonical-chain miss, named: three same-batch copies emit " +
      "(a,b) and (a,c) but never (b,c); the batch twin is the backstop " +
      "that has all three pairs") {
    val fp = 0x0123456789abcdefL
    val batches = Seq(Seq(FpDoc(ts(0), 1L, fp), FpDoc(ts(1), 2L, fp),
      FpDoc(ts(2), 3L, fp)))
    val streamed = StreamReplay.replay[FpDoc](spark, batches,
        df => StreamingOps.fingerprintCandidatesStreamTtl(df, "ts",
          ttlMs = HourMs).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == Set((1L, 2L), (1L, 3L)),
      s"canonical-chain contract drifted: $streamed")
    assert(!streamed.contains((2L, 3L)),
      "two non-canonical arrivals paired against each other — the " +
        "documented miss no longer holds; update the scaladoc")
  }
}
