package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 registry: the exact-substring dedup tier (Lee et al. 2022
  * shape), perceptual image near-dup through the banded-LSH path, and
  * DSIR-style importance-resampling weights — each paired with a DuckDB
  * oracle that independently replays the semantics.
  */
object HorizonQueries {

  // --------------------------------------------------------------------
  // Exact-substring dedup (graft.ext.SubstringDedup)
  // --------------------------------------------------------------------

  private val SubK = 8
  private val SubMinLen = 20
  private val SubMaxDf = 64

  /** Per-document removed-span intervals from maximal cross-document
    * duplicate token runs ≥ 20 tokens ([[graft.ext.SubstringDedup
    * .mergedSpans]], 8-token anchors, df cap 64).
    */
  def qSubstringSpans(spark: SparkSession, dir: String): DataFrame =
    graft.ext.SubstringDedup.mergedSpans(Tables.documents(spark, dir),
        "doc_id", "text", k = SubK, minLen = SubMinLen, maxDf = SubMaxDf)
      .orderBy(col("doc_id"), col("span_start"))

  /** Per-document dedup rate over those spans ([[graft.ext.SubstringDedup
    * .dedupStats]]) — the "how much would exact-substring dedup cut"
    * readout.
    */
  def qSubstringDedup(spark: SparkSession, dir: String): DataFrame =
    // gramHash (r17): 16-byte anchor keys, the r15 production key — results
    // identical short of a ~2^-128 collision (SubstringDedupSpec
    // differential); q_substring_spans deliberately KEEPS the string key so
    // the spans pipeline retains a live string↔hash differential pair
    // (q_substring_spans vs q_substring_hashed).
    graft.ext.SubstringDedup.dedupStats(Tables.documents(spark, dir),
        "doc_id", "text", k = SubK, minLen = SubMinLen, maxDf = SubMaxDf,
        gramHash = true)
      .orderBy(col("doc_id"))

  /** Shared oracle CTE chain replaying the anchor → df-cap → diagonal
    * islands → interval merge pipeline; ends with
    * `merged(doc_id, span_start, span_end, span_len)`.
    */
  private val substringCte: String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
       |grams AS (SELECT doc_id, i AS pos,
       |    array_to_string(l[i:i + ${SubK - 1}], ' ') AS g
       |  FROM (SELECT doc_id, l,
       |      unnest(generate_series(1, len(l) - ${SubK - 1})) AS i
       |    FROM toks WHERE len(l) >= $SubK)),
       |hot AS (SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS df
       |    FROM grams GROUP BY 1) WHERE df > $SubMaxDf),
       |keep AS (SELECT grams.* FROM grams ANTI JOIN hot USING (g)),
       |pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1,
       |    a.pos - b.pos AS diag
       |  FROM keep a JOIN keep b ON a.g = b.g AND a.doc_id < b.doc_id),
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
       |  FROM gr GROUP BY doc, gid)""".stripMargin

  val substringSpansSql: String =
    s"""WITH $substringCte
       |SELECT doc_id, span_start, span_end, span_len FROM merged
       |ORDER BY doc_id, span_start""".stripMargin

  val substringDedupSql: String =
    s"""WITH $substringCte,
       |tk AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
       |  FROM documents)
       |SELECT m.doc_id, COUNT(*) AS n_spans,
       |  CAST(SUM(span_len) AS BIGINT) AS dup_tokens, tk.n_tokens,
       |  ROUND(CAST(SUM(span_len) AS DOUBLE) / tk.n_tokens, 6) AS dup_rate
       |FROM merged m JOIN tk USING (doc_id)
       |GROUP BY m.doc_id, tk.n_tokens ORDER BY m.doc_id""".stripMargin

  /** The tier's APPLY step ([[graft.ext.SubstringDedup.removeSpans]]):
    * every document's text with the duplicate spans cut and survivors
    * re-joined — the artifact a curation pipeline actually writes. Docs
    * that lose everything (or have no tokens) come back empty via the
    * left join; the oracle replays the cut with a NOT EXISTS over the
    * span table and an ordered string_agg.
    */
  def qSubstringApply(spark: SparkSession, dir: String): DataFrame = {
    // gramHash = true: same rationale as qSubstringDedup (r17)
    val rs = graft.ext.SubstringDedup.removeSpans(
      Tables.documents(spark, dir), "doc_id", "text",
      k = SubK, minLen = SubMinLen, maxDf = SubMaxDf, gramHash = true)
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(rs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
      .orderBy(col("doc_id"))
  }

  val substringApplySql: String =
    s"""WITH $substringCte,
       |tk AS (SELECT doc_id, i AS pos, l[i] AS tok
       |  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l))) AS i
       |    FROM toks)),
       |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tk t
       |  WHERE NOT EXISTS (SELECT 1 FROM merged m
       |    WHERE m.doc_id = t.doc_id
       |      AND t.pos BETWEEN m.span_start AND m.span_end)),
       |agg AS (SELECT doc_id, COUNT(*) AS n_tokens_kept,
       |    string_agg(tok, ' ' ORDER BY pos) AS text_dedup
       |  FROM kept GROUP BY 1)
       |SELECT d.doc_id, COALESCE(a.n_tokens_kept, 0) AS n_tokens_kept,
       |  COALESCE(a.text_dedup, '') AS text_dedup
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // --------------------------------------------------------------------
  // Perceptual image near-dup through the banded-LSH path
  // --------------------------------------------------------------------

  private val ImgW = 9
  private val ImgH = 8
  private val ImgMaxHam = 3

  /** Image near-dup pairs: REAL 9×8 grayscale PNGs are rendered from
    * md5-derived per-cell lumas (docs with id ≡ 1 mod 10 reuse the
    * PREVIOUS doc's pattern with one perturbed cell — a planted near-dup,
    * flipping ≤ 2 dHash bits), dHash'd through `javax.imageio` decode,
    * and paired within Hamming ≤ 3 by [[graft.multimodal.Multimodal
    * .perceptualDupPairs]]'s banded equi-join (4 bands × 16 bits;
    * pigeonhole makes the banding EXACT at this budget, never corpus²).
    * The budget was 7 (8 × 8-bit bands) until the r14 sf1.0 probe caught
    * the 256-key bands saturating — ~n/256 images per bucket goes
    * quadratic, the same failure the r13 probe found in the 8-bit simhash
    * bands; 16-bit bands stay sparse into the tens of millions of images,
    * and the planted dups sit at Hamming ≤ 2 so the tightened budget
    * changes no tested output. Because the 9×8 canvas maps one pixel
    * per dHash grid cell and PNG is lossless, the decoded-pixel hash has a
    * closed form over the generator expressions — the oracle computes
    * pairwise Hamming straight from them, so it independently checks the
    * render → decode → hash → band → verify pipeline end to end.
    */
  def qImageNearDup(spark: SparkSession, dir: String): DataFrame = {
    // JVM twin of the documented per-cell generator expression
    // conv(substring(md5(pat || '_' || y || '_' || x), 1, 8), 16, 10) % 256
    // with the (y, x) = (3, 4) perturbation on copies — one mapPartitions
    // pass instead of the 72-element interpreted transform/md5 column
    // (Multimodal.md5Samples; values bit-identical, Md5SamplesSpec +
    // oracle). The r16 q_image_near_dup bimodality (fast ~2.1 s / slow
    // ~6.5 s reps on identical plans) was this expression's C2
    // recompilation; the JVM pass removes it at the root.
    val px = graft.multimodal.Multimodal.md5Samples(
      Tables.documents(spark, dir).select(col("doc_id")), "doc_id",
      ImgW * ImgH, (h, id, i) => {
        val pat = if (id % 10 == 1) id - 1 else id
        val y = i / ImgW
        val x = i % ImgW
        val v = h.hex32(s"${pat}_${y}_$x") % 256
        (if (id % 10 == 1 && y == 3 && x == 4) (v + 60) % 256 else v).toInt
      }, samplesCol = "pixels")
    val img = graft.multimodal.Multimodal.synthPixelPng(px, "pixels",
      ImgW, ImgH)
    graft.multimodal.Multimodal.perceptualDupPairs(img, "doc_id", "media",
        maxHamming = ImgMaxHam)
      .orderBy(col("id_a"), col("id_b"))
  }

  val imageNearDupSql: String =
    s"""WITH px AS (SELECT doc_id, y, x,
       |    CASE WHEN doc_id % 10 = 1 AND y = 3 AND x = 4
       |      THEN (v + 60) % 256 ELSE v END AS v
       |  FROM (SELECT doc_id, i // $ImgW AS y, i % $ImgW AS x,
       |      ('0x' || substr(md5((CASE WHEN doc_id % 10 = 1
       |          THEN doc_id - 1 ELSE doc_id END) || '_' ||
       |          (i // $ImgW) || '_' || (i % $ImgW)), 1, 8))::BIGINT % 256
       |        AS v
       |    FROM (SELECT doc_id FROM documents) CROSS JOIN
       |      (SELECT unnest(generate_series(0, ${ImgW * ImgH - 1})) AS i))),
       |bits AS (SELECT a.doc_id, a.y, a.x, a.v > c.v AS bit
       |  FROM px a JOIN px c ON a.doc_id = c.doc_id AND a.y = c.y
       |    AND c.x = a.x + 1
       |  WHERE a.x < ${ImgW - 1}),
       |ham AS (SELECT p.doc_id AS id_a, q.doc_id AS id_b,
       |    CAST(SUM(CASE WHEN p.bit <> q.bit THEN 1 ELSE 0 END) AS BIGINT)
       |      AS hamming
       |  FROM bits p JOIN bits q ON p.y = q.y AND p.x = q.x
       |    AND p.doc_id < q.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= $ImgMaxHam
       |ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------------------------
  // DSIR-style importance-resampling weights
  // --------------------------------------------------------------------

  /** DSIR-style data SELECTION (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169) — the
    * resampling member the weights-only `q_dsir_weights`
    * ([[VanguardQueries]], target = en) stops short of:
    * hashed word-unigram bag features (256 md5 buckets), two
    * add-one-smoothed bag-of-ngrams models — target = the `lang='de'`
    * slice, raw = the whole corpus — and per-doc importance weight
    * log p_target(doc) − log p_raw(doc) = Σ_g c_g·(ln θT_g − ln θR_g).
    * All model counts are exact integers; each ln lands in a
    * DECIMAL(18,8) ladder so the per-doc sum is EXACT on both engines
    * (the q_ndcg discipline), with one double cast at the readout. The
    * deterministic selection policy takes the top ⌈n/5⌉ docs by weight
    * (ties → smallest doc_id) via [[graft.ext.GlobalRank]] — no
    * single-task global window. Docs with no tokens drop out (no
    * features ⇒ no weight).
    *
    * Scale shape: token explode is scan-side; ONE shuffle to (doc,g)
    * counts; the bucket model is a 256-row aggregate broadcast back;
    * per-doc weights are one more keyed aggregate; ranking is the
    * range-partition prefix trick.
    */
  def qDsirSelect(spark: SparkSession, dir: String): DataFrame = {
    val B = 256
    val docs = Tables.documents(spark, dir)
    val tok = docs.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long") % B)
          .as("g"))
    // dgl feeds the bucket model AND the per-doc weight aggregate —
    // checkpoint the (doc, bucket) counts so the token explode over the
    // text column runs once, not once per consumer (plan audit: 9 scans
    // of documents without it)
    val dgl = tok.groupBy(col("doc_id"), col("g"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val buckets = dgl.groupBy(col("g"))
      .agg(sum(when(col("lang") === "de", col("c")).otherwise(0L)).as("ct"),
        sum(col("c")).as("cr"))
    val totals = buckets.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    // quantize the log-ratio DIFFERENCE once at DECIMAL(12,6) — the
    // logRatiosFromDist recipe: casting each log separately on the 1e-8
    // grid doubled the boundary exposure at 100x finer pitch, and the
    // r15 sf1.0 value-hash gate caught exactly that (6th-decimal
    // log_weight flips + selection-membership swaps near the threshold)
    val term = buckets.crossJoin(broadcast(totals))
      .select(col("g"),
        (log((col("ct") + 1).cast("double") / (col("tt") + B)) -
          log((col("cr") + 1).cast("double") / (col("tr") + B)))
          .cast("decimal(12,6)").as("dterm"))
    val perDoc = dgl.join(broadcast(term), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c").cast("decimal(10,0)") * col("dterm")).as("__lw"),
        sum(col("c")).as("n_tokens"))
    val ranked = graft.ext.GlobalRank.globalRowNumber(perDoc,
      Seq(col("__lw").desc, col("doc_id")), "rank")
    val tot = perDoc.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n_tokens"),
        round(col("__lw").cast("double"), 6).as("log_weight"), col("rank"),
        (col("rank") <= (col("__n") + 4) / lit(5)).as("selected"))
      .orderBy(col("doc_id"))
  }

  val dsirSelectSql: String =
    """WITH tok AS (SELECT doc_id, lang,
      |    ('0x' || substr(md5(w), 1, 8))::BIGINT % 256 AS g
      |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      |    FROM documents) WHERE w <> ''),
      |dgl AS (SELECT doc_id, lang, g, COUNT(*) AS c FROM tok
      |  GROUP BY 1, 2, 3),
      |bk AS (SELECT g,
      |    CAST(SUM(CASE WHEN lang = 'de' THEN c ELSE 0 END) AS BIGINT)
      |      AS ct,
      |    CAST(SUM(c) AS BIGINT) AS cr FROM dgl GROUP BY 1),
      |tts AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt,
      |    CAST(SUM(cr) AS BIGINT) AS tr FROM bk),
      |term AS (SELECT g,
      |    CAST(ln(CAST(ct + 1 AS DOUBLE) / (tt + 256)) -
      |      ln(CAST(cr + 1 AS DOUBLE) / (tr + 256)) AS DECIMAL(12,6))
      |      AS dterm
      |  FROM bk CROSS JOIN tts),
      |pd AS (SELECT doc_id,
      |    SUM(CAST(c AS DECIMAL(10,0)) * dterm) AS logw,
      |    CAST(SUM(c) AS BIGINT) AS n_tokens
      |  FROM dgl JOIN term USING (g) GROUP BY 1),
      |rk AS (SELECT doc_id, n_tokens, logw,
      |    ROW_NUMBER() OVER (ORDER BY logw DESC, doc_id) AS rank FROM pd),
      |nd AS (SELECT COUNT(*) AS n_docs FROM pd)
      |SELECT doc_id, n_tokens, ROUND(CAST(logw AS DOUBLE), 6) AS log_weight,
      |  rank, rank <= (n_docs + 4) // 5 AS selected
      |FROM rk CROSS JOIN nd ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_substring_spans" -> (qSubstringSpans _),
    "q_substring_dedup" -> (qSubstringDedup _),
    "q_substring_apply" -> (qSubstringApply _),
    "q_image_near_dup" -> (qImageNearDup _),
    "q_dsir_select" -> (qDsirSelect _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_substring_spans" -> substringSpansSql,
    "q_substring_dedup" -> substringDedupSql,
    "q_substring_apply" -> substringApplySql,
    "q_image_near_dup" -> imageNearDupSql,
    "q_dsir_select" -> dsirSelectSql
  )
}
