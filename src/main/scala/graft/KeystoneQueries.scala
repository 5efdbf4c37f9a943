package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 registry: the exact-substring tier's WITHIN-document repeat
  * handling (the r13 pipeline's `d1 < d2` filter made internal
  * boilerplate invisible — Lee et al. 2022's dedup removes self-repeats
  * too) and perceptual AUDIO near-dup through the banded-Hamming path
  * (the image tier's pigeonhole join, now over a loudness-envelope
  * fingerprint). Each query pairs the engine pipeline with a DuckDB
  * oracle that independently replays the semantics.
  */
object KeystoneQueries {

  // --------------------------------------------------------------------
  // Exact-substring dedup, within-document repeats
  // --------------------------------------------------------------------

  private val SubK = 8
  private val SubMinLen = 20
  private val SubMaxDf = 64
  private val SubSelfOcc = 8

  /** Merged removed-span intervals with the substring tier's self-repeat
    * handling ON ([[graft.ext.SubstringDedup.mergedSpans]],
    * includeSelf = true): cross-document runs AND within-document repeats
    * land in one span table. The synthetic corpus carries no natural
    * ≥ 20-token in-doc repeats (measured: zero repeated 8-grams beyond
    * 4-gram noise), so the query PLANTS them deterministically — docs
    * with doc_id ≡ 0 (mod 7) get their first 25 tokens re-appended at the
    * end, the same planted-fixture pattern as q_image_near_dup — and the
    * oracle replays both the plant and the full anchor → df-cap →
    * self-occurrence-cap → diagonal-islands → interval-merge pipeline.
    */
  def qSubstringSelf(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val l = split(col("text"), " ")
    val aug = d.select(col("doc_id"),
      when(col("doc_id") % 7 === 0,
        concat_ws(" ", col("text"), concat_ws(" ", slice(l, 1, 25))))
        .otherwise(col("text")).as("text"))
    // gramHash (r17): every anchor shuffle carries the 16-byte (h1, h2)
    // fingerprint instead of the 8-token gram string — the r15 production
    // key (measured −31% shuffle bytes on the spans pipeline). Results are
    // identical short of a ~2^-128 collision (SubstringDedupSpec holds the
    // string/hash differential for the includeSelf path too); the oracle
    // stays the string-path SQL, so hash-green doubles as the differential.
    graft.ext.SubstringDedup.mergedSpans(aug, "doc_id", "text",
        k = SubK, minLen = SubMinLen, maxDf = SubMaxDf,
        includeSelf = true, maxSelfOcc = SubSelfOcc, gramHash = true)
      .orderBy(col("doc_id"), col("span_start"))
  }

  val substringSelfSql: String =
    s"""WITH atoks AS (SELECT doc_id,
       |    CASE WHEN doc_id % 7 = 0 THEN text || ' ' ||
       |      array_to_string(string_split(text, ' ')[1:25], ' ')
       |    ELSE text END AS text FROM documents),
       |toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM atoks),
       |grams AS (SELECT doc_id, i AS pos,
       |    array_to_string(l[i:i + ${SubK - 1}], ' ') AS g
       |  FROM (SELECT doc_id, l,
       |      unnest(generate_series(1, len(l) - ${SubK - 1})) AS i
       |    FROM toks WHERE len(l) >= $SubK)),
       |hot AS (SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS df
       |    FROM grams GROUP BY 1) WHERE df > $SubMaxDf),
       |keep AS (SELECT grams.* FROM grams ANTI JOIN hot USING (g)),
       |occhot AS (SELECT doc_id, g FROM (SELECT doc_id, g, COUNT(*) AS occ
       |    FROM keep GROUP BY 1, 2) WHERE occ > $SubSelfOcc),
       |skeep AS (SELECT keep.* FROM keep ANTI JOIN occhot
       |  USING (doc_id, g)),
       |pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1,
       |    a.pos - b.pos AS diag
       |    FROM keep a JOIN keep b ON a.g = b.g AND a.doc_id < b.doc_id
       |  UNION ALL
       |  SELECT a.doc_id, a.doc_id, a.pos, a.pos - b.pos
       |    FROM skeep a JOIN skeep b ON a.doc_id = b.doc_id
       |      AND a.g = b.g AND a.pos > b.pos),
       |isl AS (SELECT *, p1 - ROW_NUMBER() OVER (PARTITION BY d1, d2, diag
       |    ORDER BY p1) AS grp FROM pr),
       |runs AS (SELECT d1, d2, diag, MIN(p1) AS s1, MAX(p1) AS e1p
       |  FROM isl GROUP BY d1, d2, diag, grp
       |  HAVING MAX(p1) - MIN(p1) + $SubK >= $SubMinLen),
       |sp0 AS (SELECT d1 AS doc, s1 AS s, e1p + ${SubK - 1} AS e FROM runs
       |  UNION
       |  SELECT d2, s1 - diag, e1p - diag + ${SubK - 1} FROM runs),
       |mg AS (SELECT doc, s, e, MAX(e) OVER (PARTITION BY doc
       |    ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |    AS maxe FROM sp0),
       |gr AS (SELECT doc, s, e, SUM(CASE WHEN maxe IS NULL OR s > maxe + 1
       |    THEN 1 ELSE 0 END) OVER (PARTITION BY doc ORDER BY s, e
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid FROM mg),
       |merged AS (SELECT doc AS doc_id, MIN(s) AS span_start,
       |    MAX(e) AS span_end, MAX(e) - MIN(s) + 1 AS span_len
       |  FROM gr GROUP BY doc, gid)
       |SELECT doc_id, span_start, span_end, span_len FROM merged
       |ORDER BY doc_id, span_start""".stripMargin

  // --------------------------------------------------------------------
  // Perceptual audio near-dup through the banded-Hamming path
  // --------------------------------------------------------------------

  private val AudWindows = 65
  private val AudMaxHam = 3

  /** Audio near-dup pairs: REAL mono 16-bit PCM WAVs are synthesized from
    * md5-derived per-window sample values (docs with id ≡ 1 mod 10 reuse
    * the PREVIOUS doc's waveform with one perturbed window — a planted
    * near-dup flipping at most the two neighboring envelope bits),
    * fingerprinted through the real RIFF parse
    * ([[graft.multimodal.WavCodec.audioFingerprint]]: 65-window loudness
    * envelope, sign-of-delta bits), and paired within Hamming ≤ 3 by the
    * same pigeonhole-banded equi-join as the image tier (4 bands ×
    * 16 bits — exact recall at this budget, never corpus²). One sample
    * per envelope window and non-negative amplitudes give the decoded
    * fingerprint a closed form over the generator expressions, so the
    * oracle checks the encode → parse → fingerprint → band → verify
    * pipeline end to end.
    */
  def qAudioNearDup(spark: SparkSession, dir: String): DataFrame = {
    // JVM twin of the documented generator expression
    // conv(substring(md5(pat || '_' || w), 1, 8), 16, 10) % 32768 with the
    // w = 7 perturbation — one mapPartitions pass instead of the
    // interpreted transform/md5 column (Multimodal.md5Samples; values
    // bit-identical, Md5SamplesSpec + oracle)
    val sm = graft.multimodal.Multimodal.md5Samples(
      Tables.documents(spark, dir).select(col("doc_id")), "doc_id",
      AudWindows, (h, id, w) => {
        val pat = if (id % 10 == 1) id - 1 else id
        val v = h.hex32(s"${pat}_$w") % 32768
        (if (id % 10 == 1 && w == 7) (v + 9000) % 32768 else v).toInt
      })
    val wav = graft.multimodal.Multimodal.synthPcmWav(sm, "samples",
      sampleRate = 16000)
    graft.multimodal.Multimodal.audioDupPairs(wav, "doc_id", "media",
        maxHamming = AudMaxHam)
      .orderBy(col("id_a"), col("id_b"))
  }

  val audioNearDupSql: String =
    s"""WITH v0 AS (SELECT doc_id, w,
       |    ('0x' || substr(md5((CASE WHEN doc_id % 10 = 1
       |        THEN doc_id - 1 ELSE doc_id END) || '_' || w), 1,
       |      8))::BIGINT % 32768 AS v0
       |  FROM (SELECT doc_id FROM documents) CROSS JOIN
       |    (SELECT unnest(generate_series(0, ${AudWindows - 1})) AS w)),
       |v AS (SELECT doc_id, w, CASE WHEN doc_id % 10 = 1 AND w = 7
       |    THEN (v0 + 9000) % 32768 ELSE v0 END AS v FROM v0),
       |bits AS (SELECT a.doc_id, a.w AS b, n.v > a.v AS bit
       |  FROM v a JOIN v n ON a.doc_id = n.doc_id AND n.w = a.w + 1
       |  WHERE a.w < ${AudWindows - 1}),
       |ham AS (SELECT p.doc_id AS id_a, q.doc_id AS id_b,
       |    CAST(SUM(CASE WHEN p.bit <> q.bit THEN 1 ELSE 0 END) AS BIGINT)
       |      AS hamming
       |  FROM bits p JOIN bits q ON p.b = q.b AND p.doc_id < q.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= $AudMaxHam
       |ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------------------------
  // Perceptual video near-dup through the banded-Hamming path
  // --------------------------------------------------------------------

  /** Video near-dup pairs — the third member of the banded-Hamming family
    * (image dHash, audio envelope, now video): REAL ISO-BMFF MP4s are
    * synthesized with md5-derived mdat sample bytes (docs with id ≡ 1 mod
    * 10 reuse the PREVIOUS doc's payload with one perturbed window),
    * fingerprinted through the real box walk ([[graft.multimodal.Mp4Codec
    * .videoFingerprint]]: 65-window mdat envelope, sign-of-delta bits) and
    * paired within Hamming ≤ 3 by the shared pigeonhole-banded equi-join.
    * One byte per envelope window gives the fingerprint a closed form, so
    * the oracle checks encode → box-walk → fingerprint → band → verify
    * end to end.
    */
  def qVideoNearDup(spark: SparkSession, dir: String): DataFrame = {
    // JVM twin of conv(substring(md5('v' || pat || '_' || w), 1, 8), 16,
    // 10) % 256 with the w = 11 perturbation (see qAudioNearDup)
    val sm = graft.multimodal.Multimodal.md5Samples(
      Tables.documents(spark, dir).select(col("doc_id")), "doc_id",
      AudWindows, (h, id, w) => {
        val pat = if (id % 10 == 1) id - 1 else id
        val v = h.hex32(s"v${pat}_$w") % 256
        (if (id % 10 == 1 && w == 11) (v + 97) % 256 else v).toInt
      })
    val mp4 = graft.multimodal.Multimodal.synthMp4Samples(sm, "samples")
    graft.multimodal.Multimodal.videoDupPairs(mp4, "doc_id", "media",
        maxHamming = AudMaxHam)
      .orderBy(col("id_a"), col("id_b"))
  }

  val videoNearDupSql: String =
    s"""WITH v0 AS (SELECT doc_id, w,
       |    ('0x' || substr(md5('v' || (CASE WHEN doc_id % 10 = 1
       |        THEN doc_id - 1 ELSE doc_id END) || '_' || w), 1,
       |      8))::BIGINT % 256 AS v0
       |  FROM (SELECT doc_id FROM documents) CROSS JOIN
       |    (SELECT unnest(generate_series(0, ${AudWindows - 1})) AS w)),
       |v AS (SELECT doc_id, w, CASE WHEN doc_id % 10 = 1 AND w = 11
       |    THEN (v0 + 97) % 256 ELSE v0 END AS v FROM v0),
       |bits AS (SELECT a.doc_id, a.w AS b, n.v > a.v AS bit
       |  FROM v a JOIN v n ON a.doc_id = n.doc_id AND n.w = a.w + 1
       |  WHERE a.w < ${AudWindows - 1}),
       |ham AS (SELECT p.doc_id AS id_a, q.doc_id AS id_b,
       |    CAST(SUM(CASE WHEN p.bit <> q.bit THEN 1 ELSE 0 END) AS BIGINT)
       |      AS hamming
       |  FROM bits p JOIN bits q ON p.b = q.b AND p.doc_id < q.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= $AudMaxHam
       |ORDER BY id_a, id_b""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_substring_self" -> (qSubstringSelf _),
    "q_audio_near_dup" -> (qAudioNearDup _),
    "q_video_near_dup" -> (qVideoNearDup _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_substring_self" -> substringSelfSql,
    "q_audio_near_dup" -> audioNearDupSql,
    "q_video_near_dup" -> videoNearDupSql
  )
}
