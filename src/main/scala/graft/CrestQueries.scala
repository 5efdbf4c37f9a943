package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 registry: SUB-window shift tolerance for the media near-dup
  * tier. The r15 shingled path ([[BeaconQueries]]) reads the envelope on a
  * non-overlapping window grid, so it only survives trims that are a whole
  * number of windows — an offset of half a window re-phases every window
  * boundary and scrambles all fingerprints, and real-world edits are
  * rarely window-aligned. Overlapping windows (hop < window) restore the
  * alignment for any trim that is a multiple of the hop, dropping the
  * tolerance granularity from windowFrames to hopFrames at a linear row
  * fan-out. The fixtures here plant a trim of 2.5 WINDOWS (5 samples at
  * windowFrames = 2) — provably invisible to the non-overlapping path
  * (ShiftedOverlapSpec holds the negative control) and recovered by the
  * hop-1 overlap path at hamming 0, offset_hops = +5.
  */
object CrestQueries {

  private val OvSamples = 160 // samples (audio) / mdat bytes (video) per blob
  private val OvTrim = 5      // planted trim in samples = 2.5 windows at W=2
  private val OvMaxHam = 3

  private def md5Val(prefix: String, d: Column, w: Column,
                     mod: Int): Column =
    conv(substring(md5(concat(lit(prefix), d.cast("string"), lit("_"),
      w.cast("string"))), 1, 8), 16, 10).cast("long") % mod

  /** Sub-window shift-tolerant audio near-dup: docs with id ≡ 1 (mod 10)
    * carry the PREVIOUS doc's waveform trimmed by [[OvTrim]] = 5 samples
    * — 2.5 windows at windowFrames = 2, so the trim is NOT window-aligned
    * and [[graft.multimodal.Multimodal.audioDupPairsShifted]] cannot see
    * it (every non-overlapping window boundary re-phases).
    * [[graft.multimodal.Multimodal.audioDupPairsShiftedOverlap]] at
    * hopFrames = 1 recovers each pair at hamming 0, offset_hops = +5
    * through real WAV encode → RIFF parse → overlapping-window envelope →
    * shingled fingerprints → pigeonhole-banded join. The oracle replays
    * the whole chain in closed form (window sums stand in for means —
    * same comparisons, no division).
    */
  def qAudioSubwindowDup(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val copies = id % 10 === 1
    val samples = transform(sequence(lit(0), lit(OvSamples - 1)), w =>
      when(copies && w <= OvSamples - OvTrim - 1,
          md5Val("ao", id - 1, w + OvTrim, 32768))
        .otherwise(md5Val("ao", id, w, 32768)).cast("int"))
    val sm = Tables.documents(spark, dir).select(id, samples.as("samples"))
    val wav = graft.multimodal.Multimodal.synthPcmWav(sm, "samples",
      sampleRate = 16000)
    graft.multimodal.Multimodal.audioDupPairsShiftedOverlap(wav, "doc_id",
        "media", maxHamming = OvMaxHam, windowFrames = 2, hopFrames = 1)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Sub-window shift-tolerant video near-dup — [[qAudioSubwindowDup]]'s
    * plant over mdat sample bytes ([[graft.multimodal.Multimodal
    * .videoDupPairsShiftedOverlap]]: real MP4 encode → box walk →
    * overlapping byte-window envelope → shingled fingerprints → banded
    * join).
    */
  def qVideoSubwindowDup(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val copies = id % 10 === 1
    val samples = transform(sequence(lit(0), lit(OvSamples - 1)), w =>
      when(copies && w <= OvSamples - OvTrim - 1,
          md5Val("vo", id - 1, w + OvTrim, 256))
        .otherwise(md5Val("vo", id, w, 256)).cast("int"))
    val sm = Tables.documents(spark, dir).select(id, samples.as("samples"))
    val mp4 = graft.multimodal.Multimodal.synthMp4Samples(sm, "samples")
    graft.multimodal.Multimodal.videoDupPairsShiftedOverlap(mp4, "doc_id",
        "media", maxHamming = OvMaxHam, windowBytes = 2, hopBytes = 1)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Shared oracle chain for the sub-window fixtures: generator values →
    * overlapping-window envelope SUMS (window w = v(w) + v(w+1); the
    * engine's /windowFrames mean normalization is order-preserving, so
    * sum comparisons replay it exactly with no floating point) →
    * sign-of-delta bits → per-(shingle, band) 16-bit keys → banded
    * candidates (pigeonhole-exact) → exact hamming per alignment →
    * lexicographically minimal (hamming, offset, shingle) witness.
    */
  private def subwindowSql(prefix: String, mod: Int): String = {
    val lastCopied = OvSamples - OvTrim - 1
    val nWin = OvSamples - 1          // overlapping W=2 hop=1 windows
    val nShingles = nWin - 65         // max shingle index
    s"""WITH v AS (SELECT doc_id, w,
       |    ('0x' || substr(md5('$prefix' ||
       |        (CASE WHEN doc_id % 10 = 1 AND w <= $lastCopied
       |           THEN doc_id - 1 ELSE doc_id END) || '_' ||
       |        (CASE WHEN doc_id % 10 = 1 AND w <= $lastCopied
       |           THEN w + $OvTrim ELSE w END)), 1, 8))::BIGINT % $mod AS v
       |  FROM (SELECT doc_id FROM documents) CROSS JOIN
       |    (SELECT unnest(generate_series(0, ${OvSamples - 1})) AS w)),
       |env AS (SELECT a.doc_id, a.w, a.v + n.v AS env
       |  FROM v a JOIN v n ON a.doc_id = n.doc_id AND n.w = a.w + 1
       |  WHERE a.w < ${OvSamples - 1}),
       |d AS (SELECT a.doc_id, a.w,
       |    CASE WHEN n.env > a.env THEN 1 ELSE 0 END AS bit
       |  FROM env a JOIN env n ON a.doc_id = n.doc_id AND n.w = a.w + 1
       |  WHERE a.w < ${nWin - 1}),
       |bands AS (SELECT d.doc_id, sh.s, ks.k,
       |    CAST(SUM(bit * (1 << (w - sh.s - 16 * ks.k))) AS BIGINT) AS bits
       |  FROM d
       |  CROSS JOIN (SELECT unnest(generate_series(0, $nShingles)) AS s) sh
       |  CROSS JOIN (SELECT unnest(generate_series(0, $OvMaxHam)) AS k) ks
       |  WHERE d.w >= sh.s + 16 * ks.k AND d.w < sh.s + 16 * (ks.k + 1)
       |  GROUP BY 1, 2, 3),
       |cand AS (SELECT DISTINCT p.doc_id AS id_a, q.doc_id AS id_b,
       |    p.s AS sa, q.s AS sb
       |  FROM bands p JOIN bands q
       |    ON p.k = q.k AND p.bits = q.bits AND p.doc_id < q.doc_id),
       |ham AS (SELECT c.id_a, c.id_b, c.sa, c.sb,
       |    CAST(SUM(CASE WHEN da.bit <> db.bit THEN 1 ELSE 0 END) AS BIGINT)
       |      AS hamming
       |  FROM cand c
       |  JOIN d da ON da.doc_id = c.id_a
       |    AND da.w >= c.sa AND da.w < c.sa + 64
       |  JOIN d db ON db.doc_id = c.id_b AND db.w = da.w - c.sa + c.sb
       |  GROUP BY 1, 2, 3, 4),
       |best AS (SELECT id_a, id_b, hamming, sa - sb AS offset_hops,
       |    ROW_NUMBER() OVER (PARTITION BY id_a, id_b
       |      ORDER BY hamming, sa - sb, sa) AS rn
       |  FROM ham WHERE hamming <= $OvMaxHam)
       |SELECT id_a, id_b, hamming, offset_hops FROM best WHERE rn = 1
       |ORDER BY id_a, id_b""".stripMargin
  }

  val audioSubwindowDupSql: String = subwindowSql("ao", 32768)
  val videoSubwindowDupSql: String = subwindowSql("vo", 256)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_audio_subwindow_dup" -> (qAudioSubwindowDup _),
    "q_video_subwindow_dup" -> (qVideoSubwindowDup _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_audio_subwindow_dup" -> audioSubwindowDupSql,
    "q_video_subwindow_dup" -> videoSubwindowDupSql
  )
}
