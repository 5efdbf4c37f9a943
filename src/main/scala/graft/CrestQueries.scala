package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 registry: SUB-window trim tolerance for the media near-dup
  * tier, two ways. The r15 shingled path ([[BeaconQueries]]) reads the
  * envelope on a non-overlapping window grid, so it only survives trims
  * that are a whole number of windows — an offset of half a window
  * re-phases every window boundary and scrambles all fingerprints, and
  * real-world edits are rarely window-aligned. (1) OVERLAPPING windows
  * (hop < window) restore the alignment for any trim that is a multiple
  * of the hop, dropping the tolerance granularity from windowFrames to
  * hopFrames at a (window/hop)× row fan-out; the fixtures plant a trim of
  * 2.5 WINDOWS (5 samples at windowFrames = 2) — provably invisible to
  * the non-overlapping path (ShiftedOverlapSpec holds the negative
  * control) and recovered by the hop-1 overlap path at hamming 0,
  * offset_hops = +5. (2) CONTENT-DEFINED chunking removes the
  * granularity-vs-fan-out trade entirely: boundaries move with the
  * content, so ANY trim realigns at ~1 segment row per CdcCutMod frames
  * — the q_*_cdc_dup fixtures plant a 3-frame trim that the hop-2
  * overlap path provably misses (CdcSpec) and CDC pins with
  * offset_frames = +3.
  */
object CrestQueries {

  private val OvSamples = 160 // samples (audio) / mdat bytes (video) per blob
  private val OvTrim = 5      // planted trim in samples = 2.5 windows at W=2
  private val OvMaxHam = 3

  /** JVM form of the tier's generator (the documented column form was
    * `conv(substring(md5(prefix || d || '_' || w), 1, 8), 16, 10) % mod`,
    * a CodegenFallback transform/md5 expression that evaluated interpreted
    * and dominated the synth cost) plus the copy-shift plant, for
    * [[graft.multimodal.Multimodal.md5Samples]]: docs with id ≡ 1 (mod 10)
    * read the PREVIOUS doc's generator at w + trim for the copied head.
    * Values bit-identical (Md5SamplesSpec + oracle).
    */
  private def copyShiftGen(prefix: String, mod: Int, trim: Int)
      : (graft.multimodal.Multimodal.Md5Hex32, Long, Int) => Int = {
    val lastCopied = OvSamples - trim - 1
    (h, id, w) => {
      val (d, ww) = if (id % 10 == 1 && w <= lastCopied) (id - 1, w + trim)
        else (id, w)
      (h.hex32(prefix + d + "_" + ww) % mod).toInt
    }
  }

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
    val sm = graft.multimodal.Multimodal.md5Samples(
      Tables.documents(spark, dir).select(col("doc_id")), "doc_id",
      OvSamples, copyShiftGen("ao", 32768, OvTrim))
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
    val sm = graft.multimodal.Multimodal.md5Samples(
      Tables.documents(spark, dir).select(col("doc_id")), "doc_id",
      OvSamples, copyShiftGen("vo", 256, OvTrim))
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
       |bands AS (SELECT doc_id, s, k,
       |    CAST(SUM(bit * (1 << off)) AS BIGINT) AS bits
       |  FROM (SELECT d.doc_id, d.bit, ks.k, f.off,
       |      d.w - 16 * ks.k - f.off AS s
       |    FROM d
       |    CROSS JOIN (SELECT unnest(generate_series(0, $OvMaxHam)) AS k) ks
       |    CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS off) f)
       |  WHERE s >= 0 AND s <= $nShingles
       |  GROUP BY 1, 2, 3),
       |cand AS (SELECT DISTINCT p.doc_id AS id_a, q.doc_id AS id_b,
       |    p.s AS sa, q.s AS sb
       |  FROM bands p JOIN bands q
       |    ON p.k = q.k AND p.bits = q.bits AND p.doc_id < q.doc_id),
       |ham AS (SELECT c.id_a, c.id_b, c.sa, c.sb,
       |    CAST(SUM(CASE WHEN da.bit <> db.bit THEN 1 ELSE 0 END) AS BIGINT)
       |      AS hamming
       |  FROM cand c
       |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) jj
       |  JOIN d da ON da.doc_id = c.id_a AND da.w = c.sa + jj.j
       |  JOIN d db ON db.doc_id = c.id_b AND db.w = c.sb + jj.j
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

  private val CdcTrim = 3 // frames — deliberately NOT a multiple of any hop

  /** Content-defined-chunking audio near-dup: docs with id ≡ 1 (mod 10)
    * carry the PREVIOUS doc's waveform trimmed by [[CdcTrim]] = 3 frames.
    * No fixed grid survives an arbitrary trim without paying fan-out for
    * the granularity (the hop-2 overlap path provably misses an odd trim
    * — CdcSpec holds that negative control); the content-defined
    * boundaries of [[graft.multimodal.Multimodal.audioDupPairsCdc]] move
    * WITH the content, so every interior segment of the copy reproduces
    * the original's (fp, len) keys verbatim and the pair reports with
    * offset_frames = +3 at ~1 segment row per [[graft.multimodal
    * .Multimodal.CdcCutMod]] frames. The oracle replays the whole chain
    * in closed form: generator values → rolling cut polynomial →
    * interior segments → positional-polynomial fingerprints → df-capped
    * exact (fp, len) join → shared-count + minimal-offset witness.
    */
  def qAudioCdcDup(spark: SparkSession, dir: String): DataFrame = {
    val sm = graft.multimodal.Multimodal.md5Samples(
      Tables.documents(spark, dir).select(col("doc_id")), "doc_id",
      OvSamples, copyShiftGen("cd", 32768, CdcTrim))
    val wav = graft.multimodal.Multimodal.synthPcmWav(sm, "samples",
      sampleRate = 16000)
    graft.multimodal.Multimodal.audioDupPairsCdc(wav, "doc_id", "media")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Content-defined-chunking video near-dup — [[qAudioCdcDup]]'s plant
    * over mdat sample bytes ([[graft.multimodal.Multimodal
    * .videoDupPairsCdc]]: real MP4 encode → box walk → CDC over the
    * byte magnitudes → exact (fp, len) join).
    */
  def qVideoCdcDup(spark: SparkSession, dir: String): DataFrame = {
    val sm = graft.multimodal.Multimodal.md5Samples(
      Tables.documents(spark, dir).select(col("doc_id")), "doc_id",
      OvSamples, copyShiftGen("cv", 256, CdcTrim))
    val mp4 = graft.multimodal.Multimodal.synthMp4Samples(sm, "samples")
    graft.multimodal.Multimodal.videoDupPairsCdc(mp4, "doc_id", "media")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Closed-form oracle for the CDC fixtures: the constants mirror
    * [[graft.multimodal.Multimodal.CdcCutBase]]/CdcCutMod/CdcFpBase/
    * CdcFpMod, and the power table is generated Scala-side so both
    * engines fold the identical (B^j mod M) residues.
    */
  private def cdcSql(prefix: String, mod: Int): String = {
    val b = graft.multimodal.Multimodal.CdcCutBase
    val b2 = b * b
    val b3 = b * b * b
    val cutMod = graft.multimodal.Multimodal.CdcCutMod
    val fpM = graft.multimodal.Multimodal.CdcFpMod
    val fpB = graft.multimodal.Multimodal.CdcFpBase
    val lastCopied = OvSamples - CdcTrim - 1
    val pows = Iterator.iterate(1L)(_ * fpB % fpM).take(OvSamples)
      .zipWithIndex.map { case (p, j) => s"($j, $p)" }.mkString(", ")
    s"""WITH v AS (SELECT doc_id, w,
       |    ('0x' || substr(md5('$prefix' ||
       |        (CASE WHEN doc_id % 10 = 1 AND w <= $lastCopied
       |           THEN doc_id - 1 ELSE doc_id END) || '_' ||
       |        (CASE WHEN doc_id % 10 = 1 AND w <= $lastCopied
       |           THEN w + $CdcTrim ELSE w END)), 1, 8))::BIGINT % $mod AS v
       |  FROM (SELECT doc_id FROM documents) CROSS JOIN
       |    (SELECT unnest(generate_series(0, ${OvSamples - 1})) AS w)),
       |pows(j, p) AS (VALUES $pows),
       |hv AS (SELECT doc_id, w,
       |    (LAG(v, 3) OVER win * $b3 + LAG(v, 2) OVER win * $b2
       |      + LAG(v, 1) OVER win * $b + v) % $cutMod AS h
       |  FROM v WINDOW win AS (PARTITION BY doc_id ORDER BY w)),
       |cuts AS (SELECT doc_id, w,
       |    LEAD(w) OVER (PARTITION BY doc_id ORDER BY w) AS nw
       |  FROM hv WHERE w >= 3 AND h = 0),
       |seg AS (SELECT doc_id, w + 1 AS pos, nw AS endw, nw - w AS len
       |  FROM cuts WHERE nw IS NOT NULL AND nw - w >= 4),
       |fpseg AS (SELECT s.doc_id, s.pos, s.len,
       |    CAST(SUM(v.v * pw.p) % $fpM AS BIGINT) AS fp
       |  FROM seg s
       |  JOIN v ON v.doc_id = s.doc_id AND v.w BETWEEN s.pos AND s.endw
       |  JOIN pows pw ON pw.j = v.w - s.pos
       |  GROUP BY 1, 2, 3),
       |keep AS (SELECT fp, len FROM fpseg GROUP BY fp, len
       |  HAVING COUNT(DISTINCT doc_id) <= 64),
       |k AS (SELECT f.* FROM fpseg f JOIN keep USING (fp, len)),
       |prs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.fp, a.len,
       |    a.pos AS pa, b.pos AS pb
       |  FROM k a JOIN k b ON a.fp = b.fp AND a.len = b.len
       |    AND a.doc_id < b.doc_id),
       |agg AS (SELECT id_a, id_b,
       |    COUNT(DISTINCT (fp, len)) AS shared
       |  FROM prs GROUP BY 1, 2 HAVING COUNT(DISTINCT (fp, len)) >= 2),
       |best AS (SELECT id_a, id_b, pa - pb AS offset_frames,
       |    ROW_NUMBER() OVER (PARTITION BY id_a, id_b
       |      ORDER BY pa - pb, pa) AS rn
       |  FROM prs)
       |SELECT a.id_a, a.id_b, a.shared, b.offset_frames
       |FROM agg a JOIN best b ON a.id_a = b.id_a AND a.id_b = b.id_b
       |  AND b.rn = 1
       |ORDER BY a.id_a, a.id_b""".stripMargin
  }

  val audioCdcDupSql: String = cdcSql("cd", 32768)
  val videoCdcDupSql: String = cdcSql("cv", 256)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_audio_subwindow_dup" -> (qAudioSubwindowDup _),
    "q_video_subwindow_dup" -> (qVideoSubwindowDup _),
    "q_audio_cdc_dup" -> (qAudioCdcDup _),
    "q_video_cdc_dup" -> (qVideoCdcDup _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_audio_subwindow_dup" -> audioSubwindowDupSql,
    "q_video_subwindow_dup" -> videoSubwindowDupSql,
    "q_audio_cdc_dup" -> audioCdcDupSql,
    "q_video_cdc_dup" -> videoCdcDupSql
  )
}
