package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 registry: the exact-substring tier's PRODUCTION key path
  * (128-bit gram hashes in place of gram strings — same algorithm, 16-byte
  * shuffle keys) and SHIFT-TOLERANT audio/video near-dup (the r14
  * envelope fingerprints compare window-aligned signals, so a trimmed or
  * offset copy — the common real-world media near-dup — was invisible;
  * fixed-size windows + shingled fingerprints make it visible). Each
  * query pairs the engine pipeline with a DuckDB oracle that
  * independently replays the semantics.
  */
object BeaconQueries {

  // --------------------------------------------------------------------
  // Exact-substring dedup over hashed gram keys
  // --------------------------------------------------------------------

  /** The substring tier's merged spans computed over the HASHED gram key
    * ([[graft.ext.SubstringDedup.mergedSpans]], gramHash = true): every
    * shuffle in the anchor pipeline (df-cap aggregate, stop-gram
    * anti-join, anchor self-join) carries a 16-byte (h1, h2) struct
    * instead of a k-token string. Results are identical to the string
    * path short of a ~2⁻¹²⁸ collision, so the oracle IS the string
    * path's SQL — the query being hash-green is the differential.
    */
  def qSubstringHashed(spark: SparkSession, dir: String): DataFrame =
    graft.ext.SubstringDedup.mergedSpans(Tables.documents(spark, dir),
        "doc_id", "text", k = 8, minLen = 20, maxDf = 64, gramHash = true)
      .orderBy(col("doc_id"), col("span_start"))

  // --------------------------------------------------------------------
  // Shift-tolerant audio/video near-dup (shingled envelope fingerprints)
  // --------------------------------------------------------------------

  private val ShWindows = 80 // envelope windows per synthetic blob
  private val ShShift = 5    // planted trim, in whole windows
  private val ShMaxHam = 3

  /** JVM form of the tier's generator (the documented column form was
    * `conv(substring(md5(prefix || d || '_' || w), 1, 8), 16, 10) % mod`,
    * a CodegenFallback transform/md5 expression that evaluated interpreted
    * and dominated the synth cost) plus the copy-shift plant: docs with
    * id ≡ 1 (mod 10) read the PREVIOUS doc's generator at w + shift for
    * the copied head. Values bit-identical (Md5SamplesSpec + oracle);
    * consumed by [[graft.multimodal.Multimodal.md5Samples]].
    */
  private def copyShiftGen(prefix: String, mod: Int, shift: Int)
      : (graft.multimodal.Multimodal.Md5Hex32, Long, Int) => Int = {
    val lastCopied = ShWindows - shift - 1
    (h, id, w) => {
      val (d, ww) = if (id % 10 == 1 && w <= lastCopied) (id - 1, w + shift)
        else (id, w)
      (h.hex32(prefix + d + "_" + ww) % mod).toInt
    }
  }

  /** Shift-tolerant audio near-dup: docs with id ≡ 1 (mod 10) carry the
    * PREVIOUS doc's waveform trimmed by [[ShShift]] windows (the first 5
    * windows cut, fresh tail appended) — the classic trimmed-copy
    * near-dup that defeats the whole-signal fingerprint
    * (`q_audio_near_dup`'s path; ShiftedNearDupSpec holds the negative
    * control). [[graft.multimodal.Multimodal.audioDupPairsShifted]]
    * recovers each pair with hamming 0 at offset_windows = +5 through
    * real WAV encode → RIFF parse → fixed-window envelope → shingled
    * fingerprints → pigeonhole-banded join. One sample per window gives
    * the whole pipeline a closed form, so the oracle replays it end to
    * end, banding included.
    */
  def qAudioShiftedDup(spark: SparkSession, dir: String): DataFrame = {
    val sm = graft.multimodal.Multimodal.md5Samples(
      Tables.documents(spark, dir).select(col("doc_id")), "doc_id",
      ShWindows, copyShiftGen("as", 32768, ShShift))
    val wav = graft.multimodal.Multimodal.synthPcmWav(sm, "samples",
      sampleRate = 16000)
    graft.multimodal.Multimodal.audioDupPairsShifted(wav, "doc_id", "media",
        maxHamming = ShMaxHam, windowFrames = 1)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Shift-tolerant video near-dup — [[qAudioShiftedDup]]'s plant over
    * mdat sample bytes ([[graft.multimodal.Multimodal
    * .videoDupPairsShifted]]: real MP4 encode → box walk → fixed-window
    * byte envelope → shingled fingerprints → banded join).
    */
  def qVideoShiftedDup(spark: SparkSession, dir: String): DataFrame = {
    val sm = graft.multimodal.Multimodal.md5Samples(
      Tables.documents(spark, dir).select(col("doc_id")), "doc_id",
      ShWindows, copyShiftGen("vs", 256, ShShift))
    val mp4 = graft.multimodal.Multimodal.synthMp4Samples(sm, "samples")
    graft.multimodal.Multimodal.videoDupPairsShifted(mp4, "doc_id", "media",
        maxHamming = ShMaxHam, windowBytes = 1)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Shared oracle chain for the shifted fixtures: generator values →
    * sign-of-delta bits (shingle-independent: bit b of shingle s is the
    * delta at window s + b) → per-(shingle, band) 16-bit keys → banded
    * candidates (pigeonhole-exact, the same theorem the engine relies on)
    * → exact hamming per alignment → lexicographically minimal
    * (hamming, offset, shingle) witness per pair.
    */
  private def shiftedSql(prefix: String, mod: Int): String = {
    val lastCopied = ShWindows - ShShift - 1
    val nShingles = ShWindows - 65 // max shingle index
    s"""WITH v AS (SELECT doc_id, w,
       |    ('0x' || substr(md5('$prefix' ||
       |        (CASE WHEN doc_id % 10 = 1 AND w <= $lastCopied
       |           THEN doc_id - 1 ELSE doc_id END) || '_' ||
       |        (CASE WHEN doc_id % 10 = 1 AND w <= $lastCopied
       |           THEN w + $ShShift ELSE w END)), 1, 8))::BIGINT % $mod AS v
       |  FROM (SELECT doc_id FROM documents) CROSS JOIN
       |    (SELECT unnest(generate_series(0, ${ShWindows - 1})) AS w)),
       |d AS (SELECT a.doc_id, a.w,
       |    CASE WHEN n.v > a.v THEN 1 ELSE 0 END AS bit
       |  FROM v a JOIN v n ON a.doc_id = n.doc_id AND n.w = a.w + 1
       |  WHERE a.w < ${ShWindows - 1}),
       |bands AS (SELECT d.doc_id, sh.s, ks.k,
       |    CAST(SUM(bit * (1 << (w - sh.s - 16 * ks.k))) AS BIGINT) AS bits
       |  FROM d
       |  CROSS JOIN (SELECT unnest(generate_series(0, $nShingles)) AS s) sh
       |  CROSS JOIN (SELECT unnest(generate_series(0, $ShMaxHam)) AS k) ks
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
       |best AS (SELECT id_a, id_b, hamming, sa - sb AS offset_windows,
       |    ROW_NUMBER() OVER (PARTITION BY id_a, id_b
       |      ORDER BY hamming, sa - sb, sa) AS rn
       |  FROM ham WHERE hamming <= $ShMaxHam)
       |SELECT id_a, id_b, hamming, offset_windows FROM best WHERE rn = 1
       |ORDER BY id_a, id_b""".stripMargin
  }

  val audioShiftedDupSql: String = shiftedSql("as", 32768)
  val videoShiftedDupSql: String = shiftedSql("vs", 256)

  // --------------------------------------------------------------------
  // Large-codebook ADC through the broadcast-join path
  // --------------------------------------------------------------------

  /** ADC top-10 against a 128-codeword seeded book — above
    * [[graft.ext.ProductQuant.AdcFoldMaxCodes]], so this query exercises
    * the broadcast-LUT JOIN shape in the oracle gate (the 4-codeword
    * `q_pq_adc` rides the scan-side literal fold; the spec's differential
    * covers both, this makes the production-size path hash-checked too).
    * Same DECIMAL(18,9) pooling and (d2, code) tie-break; the oracle
    * replays all 128 × 8 assignments and the lookup sum.
    */
  def qPqAdcBigbook(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val qVec = emb.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0)
    val book = emb.filter(col("vec_id") < 128)
      .select(col("vec_id").as("code"), col("embedding").as("cvec"))
    graft.ext.ProductQuant.adcTopK(emb, "vec_id", "embedding",
        book, "code", "cvec", qVec, k = 10, excludeId = 0L)
      .select(col("vec_id"), round(col("adc_dist"), 6).as("adc_dist"))
  }

  val pqAdcBigbookSql: String =
    """WITH ss AS (SELECT unnest(generate_series(0, 7)) AS s),
      |cb AS (SELECT vec_id AS code, embedding AS ce FROM embeddings
      |  WHERE vec_id < 128),
      |d AS (SELECT v.vec_id, ss.s, cb.code,
      |    list_sum(list_transform(generate_series(1, 8),
      |      i -> (v.embedding[ss.s * 8 + i]::DOUBLE - cb.ce[ss.s * 8 + i]::DOUBLE)
      |         * (v.embedding[ss.s * 8 + i]::DOUBLE - cb.ce[ss.s * 8 + i]::DOUBLE)))
      |      AS d2
      |  FROM embeddings v CROSS JOIN ss CROSS JOIN cb),
      |asn AS (SELECT vec_id, s, code FROM (SELECT vec_id, s, code,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rk
      |  FROM d) WHERE rk = 1),
      |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      |lut AS (SELECT ss.s, cb.code,
      |    list_sum(list_transform(generate_series(1, 8),
      |      i -> (q.qe[ss.s * 8 + i]::DOUBLE - cb.ce[ss.s * 8 + i]::DOUBLE)
      |         * (q.qe[ss.s * 8 + i]::DOUBLE - cb.ce[ss.s * 8 + i]::DOUBLE)))
      |      AS dq2
      |  FROM ss CROSS JOIN cb CROSS JOIN q),
      |adc AS (SELECT asn.vec_id,
      |    CAST(SUM(CAST(lut.dq2 AS DECIMAL(18,9))) AS DOUBLE) AS adc_raw
      |  FROM asn JOIN lut ON asn.s = lut.s AND asn.code = lut.code
      |  WHERE asn.vec_id <> 0 GROUP BY 1)
      |SELECT vec_id, ROUND(adc_raw, 6) AS adc_dist FROM adc
      |ORDER BY adc_raw, vec_id LIMIT 10""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_substring_hashed" -> (qSubstringHashed _),
    "q_audio_shifted_dup" -> (qAudioShiftedDup _),
    "q_video_shifted_dup" -> (qVideoShiftedDup _),
    "q_pq_adc_bigbook" -> (qPqAdcBigbook _)
  )

  def oracleSql: Map[String, String] = Map(
    // the string-key path's SQL verbatim: hashed keys change no result
    "q_substring_hashed" -> HorizonQueries.substringSpansSql,
    "q_audio_shifted_dup" -> audioShiftedDupSql,
    "q_video_shifted_dup" -> videoShiftedDupSql,
    "q_pq_adc_bigbook" -> pqAdcBigbookSql
  )
}
